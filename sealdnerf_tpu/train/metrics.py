"""Evaluation meters: PSNR / SSIM / LPIPS.

Parity with reference nerf/utils.py:206-314 (update/measure/write/report/clear
protocol). SSIM is implemented natively (gaussian-window SSIM, the standard
formulation torchmetrics uses); LPIPS requires pretrained AlexNet weights,
which need network access -- the meter degrades to disabled with a warning
when the `lpips` package (or its weights) is unavailable.
"""

import numpy as np


class _MeterBase:
    def __init__(self):
        self.v = 0.0
        self.n = 0

    def clear(self):
        self.v, self.n = 0.0, 0

    def measure(self):
        return self.v / max(self.n, 1)

    def write(self, writer, global_step, prefix=""):
        if writer is not None:
            writer.add_scalar(
                "/".join(filter(None, [prefix, self.name])), self.measure(),
                global_step)

    def report(self):
        return f"{self.name} = {self.measure():.6f}"


class PSNRMeter(_MeterBase):
    name = "PSNR"

    def update(self, preds, truths):
        preds = np.asarray(preds, dtype=np.float32)
        truths = np.asarray(truths, dtype=np.float32)
        mse = np.mean((preds - truths) ** 2)
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        self.v += psnr
        self.n += 1


def _gaussian_kernel(size=11, sigma=1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def ssim(img0, img1, max_val=1.0, filter_size=11, filter_sigma=1.5, k1=0.01,
         k2=0.03):
    """Gaussian-window SSIM over [H, W, C] float images (numpy)."""
    from scipy.signal import convolve2d

    img0 = np.asarray(img0, dtype=np.float64)
    img1 = np.asarray(img1, dtype=np.float64)
    if img0.ndim == 2:
        img0, img1 = img0[..., None], img1[..., None]
    g = _gaussian_kernel(filter_size, filter_sigma)
    win = np.outer(g, g)

    def filt(x):
        return np.stack(
            [convolve2d(x[..., c], win, mode="valid") for c in range(x.shape[-1])],
            axis=-1)

    mu0, mu1 = filt(img0), filt(img1)
    s00 = filt(img0 * img0) - mu0 ** 2
    s11 = filt(img1 * img1) - mu1 ** 2
    s01 = filt(img0 * img1) - mu0 * mu1
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    num = (2 * mu0 * mu1 + c1) * (2 * s01 + c2)
    den = (mu0 ** 2 + mu1 ** 2 + c1) * (s00 + s11 + c2)
    return float(np.mean(num / den))


class SSIMMeter(_MeterBase):
    name = "SSIM"

    def update(self, preds, truths):
        self.v += ssim(np.asarray(preds), np.asarray(truths))
        self.n += 1


class LPIPSMeter(_MeterBase):
    """LPIPS(alex). Disabled (measure() = 0, available = False) when the lpips
    package / its pretrained weights cannot be loaded offline."""

    def __init__(self, net="alex"):
        super().__init__()
        self.name = f"LPIPS ({net})"
        self.available = False
        try:
            import lpips  # noqa
            import torch
            self._torch = torch
            self._fn = lpips.LPIPS(net=net)
            self.available = True
        except Exception:
            self._fn = None

    def update(self, preds, truths):
        if not self.available:
            return
        t = self._torch
        p = t.from_numpy(np.asarray(preds, dtype=np.float32)).permute(2, 0, 1)[None]
        g = t.from_numpy(np.asarray(truths, dtype=np.float32)).permute(2, 0, 1)[None]
        with t.no_grad():
            self.v += float(self._fn(p * 2 - 1, g * 2 - 1))
        self.n += 1

    def report(self):
        # never report a silently-wrong 0.0 (round-1 weak spot)
        if not self.available:
            return f"{self.name} unavailable (no pretrained weights)"
        return super().report()

    def write(self, writer, global_step, prefix=""):
        if self.available:
            super().write(writer, global_step, prefix)
