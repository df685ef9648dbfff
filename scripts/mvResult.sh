#!/bin/bash
# mvResult.sh equivalent: hand SR outputs to a sibling segmentation repo's
# dataset dir (downstream geoseg consumption, /root/reference/mvResult.sh).
sroot=./result
troot=${TROOT:-../geoseg/dataset/Sat2Aer/img}
for m in ESPCN SRCNN; do
    for up in 2; do
        for ep in 25 50; do
            src=A_${m}@G2LAB_x${up}_00${ep}
            tar=${m}@G2LABx${up}@ep${ep}
            echo "mv from $src to $tar"
            if [[ -d $troot/$tar ]]; then
                echo "remove existing $tar"
                rm -rf $troot/$tar
            fi
            [[ -d $sroot/$src ]] && mv $sroot/$src $troot/$tar
        done
    done
done
echo DONE...
