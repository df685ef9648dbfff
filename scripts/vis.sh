#!/bin/bash
# vis.sh equivalent: qualitative panels gated at PSNR > 22.5 dB.
models=${@:-ESPCN}
for m in $models; do
    for up in 2; do
        for ep in 25 50; do
            GA=${m}_A2C_x${up}_00${ep}.npz
            GB=ResDeconv_C2B_x${up}_00${ep}.npz
            python -m srcgan_tpu.cli.vis_cas \
                --netGA ./checkpoints/$GA \
                --netGB ./checkpoints/$GB \
                --threshold 22.5
        done
    done
done
echo DONE...
