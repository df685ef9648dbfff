"""PatchGAN discriminator (reference model.py:595-639)."""
from __future__ import annotations

from srcgan_tpu import nn


class NLayerDiscriminator(nn.Module):
    """k4 stride-2 conv pyramid, channel doubling capped at 8x, BatchNorm,
    LeakyReLU(0.2), final 1-channel prediction map.

    Matches /root/reference/src/model/model.py:595-639 with norm='BN' default
    (use_bias=False on normed convs).  Instantiated in the CycleGAN drivers as
    NLayerDiscriminator(3, 64, 2) / (1, 64, 2) (train.py:169-180).

    torch-default conv init (the reference does not re-init the discriminator).
    """

    def __init__(self, input_nc: int, ndf: int = 64, n_layers: int = 3,
                 norm: str = "BN"):
        use_bias = norm == "IN"

        def make_norm(ch):
            return nn.BatchNorm2d(ch) if norm == "BN" else nn.InstanceNorm2d(ch)

        layers = [nn.Conv2d(input_nc, ndf, 4, 2, 1, weight_init="torch"),
                  nn.LeakyReLU(0.2)]
        nf_mult_prev, nf_mult = 1, 1
        for n in range(1, n_layers):
            nf_mult_prev, nf_mult = nf_mult, min(2 ** n, 8)
            layers += [nn.Conv2d(ndf * nf_mult_prev, ndf * nf_mult, 4, 2, 1,
                                 bias=use_bias, weight_init="torch"),
                       make_norm(ndf * nf_mult),
                       nn.LeakyReLU(0.2)]
        nf_mult_prev, nf_mult = nf_mult, min(2 ** n_layers, 8)
        layers += [nn.Conv2d(ndf * nf_mult_prev, ndf * nf_mult, 4, 1, 1,
                             bias=use_bias, weight_init="torch"),
                   make_norm(ndf * nf_mult),
                   nn.LeakyReLU(0.2),
                   nn.Conv2d(ndf * nf_mult, 1, 4, 1, 1, weight_init="torch")]
        self.model = nn.Sequential(*layers)
        # conv pyramid spatial spec: (kernel, stride, pad) per conv, for the
        # degenerate-input guard below
        self._conv_specs = ([(4, 2, 1)] * n_layers) + [(4, 1, 1), (4, 1, 1)]

    def init(self, key):
        return self.model.init(key)

    def init_state(self):
        return self.model.init_state()

    def _check_spatial(self, h: int, w: int) -> None:
        """Raise on inputs too small for the k4 pyramid.

        torch raises RuntimeError ("Kernel size can't be greater than actual
        input size") as soon as any conv's padded input is smaller than its
        kernel; an XLA conv instead emits a 0-sized prediction map, which
        turns the GAN loss into silent NaN.  Match torch's behavior (PARITY.md
        §2.2 divergence note, reference model.py:595-639)."""
        for k, s, p in self._conv_specs:
            if h + 2 * p < k or w + 2 * p < k:
                raise ValueError(
                    f"NLayerDiscriminator input too small: a {h}x{w} feature "
                    f"map (after earlier stride-2 convs) is smaller than the "
                    f"k{k} kernel — torch raises here too")
            h = (h + 2 * p - k) // s + 1
            w = (w + 2 * p - k) // s + 1

    def apply(self, p, x, state=None, train=False):
        self._check_spatial(int(x.shape[1]), int(x.shape[2]))
        return self.model.apply(p, x, state=state, train=train)
