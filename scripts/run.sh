#!/bin/bash
# run.sh equivalent (/root/reference/run.sh): train cascade at x2, eval at
# epochs 25 and 50.  Non-interactive: pass models as args (default ESPCN);
# TPU device selection is JAX's, so the reference's device prompt is dropped.
models=${@:-ESPCN}
for m in $models; do
    for up in 2; do
        python -m srcgan_tpu.cli.train_cas --SRModel $m --up $up
        for ep in 25 50; do
            GA=${m}_A2C_x${up}_00${ep}.npz
            GB=ResDeconv_C2B_x${up}_00${ep}.npz
            python -m srcgan_tpu.cli.test_cas \
                --netGA ./checkpoints/$GA \
                --netGB ./checkpoints/$GB
        done
    done
done
echo DONE...
