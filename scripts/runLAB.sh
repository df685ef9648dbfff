#!/bin/bash
# runLAB.sh equivalent: LAB pipeline at up in {2,4,8}.  The committed
# reference has the training line commented out (eval-only); we keep both,
# gate training with TRAIN=1.
models=${@:-ESPCN}
for m in $models; do
    for up in 2 4 8; do
        if [[ "${TRAIN}" == "1" ]]; then
            python -m srcgan_tpu.cli.train_cas --SRModel $m --up $up --lab
        fi
        for ep in 25 50; do
            GA=${m}@G2LAB_A2C_x${up}_00${ep}.npz
            GB=ResDeconv@G2LAB_C2B_x${up}_00${ep}.npz
            python -m srcgan_tpu.cli.test_cas \
                --netGA ./checkpoints/$GA \
                --netGB ./checkpoints/$GB
        done
    done
done
echo DONE...
