#!/bin/bash
# runConst.sh equivalent: constant-resolution pipeline (SRCNN/SRDN models).
models=${@:-SRCNN}
for m in $models; do
    for up in 2; do
        python -m srcgan_tpu.cli.train_cas --SRModel $m --up $up --const
        for ep in 25 50; do
            GA=${m}_A2C_x${up}_00${ep}.npz
            GB=ResDeconv_C2B_x${up}_00${ep}.npz
            python -m srcgan_tpu.cli.test_cas --const \
                --netGA ./checkpoints/$GA \
                --netGB ./checkpoints/$GB
        done
    done
done
echo DONE...
