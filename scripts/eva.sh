#!/bin/bash
# eva.sh equivalent: constant-resolution eval sweep over up in {4,8,16}.
models=${@:-SRCNN}
for m in $models; do
    for up in 4 8 16; do
        for ep in 25 50; do
            GA=${m}_A2C_x${up}_00${ep}.npz
            GB=ResDeconv_C2B_x${up}_00${ep}.npz
            echo "GA => $GA ; GB => $GB"
            python -m srcgan_tpu.cli.test_cas --const \
                --netGA ./checkpoints/$GA \
                --netGB ./checkpoints/$GB
        done
    done
done
echo DONE...
