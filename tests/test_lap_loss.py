"""lap_loss parity vs a torch port of the reference utils/lap_loss.py."""
import numpy as np

from materialrefgs_tpu.train.losses import lap_loss


def _torch_lap_loss(x, y, max_levels=5, size=5, sigma=2.0):
    """Direct port of the reference LapLoss (utils/lap_loss.py:10-65)."""
    import torch
    import torch.nn.functional as fnn

    grid = np.float32(np.mgrid[0:size, 0:size].T)
    g = np.exp((grid - size // 2) ** 2 / (-2.0 * sigma**2)) ** 2
    kernel = np.sum(g, axis=2)
    kernel /= np.sum(kernel)
    n_channels = x.shape[1]
    kernel = torch.FloatTensor(np.tile(kernel, (n_channels, 1, 1))[:, None])

    def conv_gauss(img):
        p = size // 2
        img = fnn.pad(img, (p, p, p, p), mode="replicate")
        return fnn.conv2d(img, kernel, groups=n_channels)

    def pyramid(img):
        cur, pyr = img, []
        for _ in range(max_levels):
            f = conv_gauss(cur)
            pyr.append(cur - f)
            cur = fnn.avg_pool2d(f, 2)
        pyr.append(cur)
        return pyr

    x = 2.0 * x - 1.0
    y = 2.0 * y - 1.0
    return float(
        sum(
            torch.nn.functional.l1_loss(a, b, reduction="sum")
            for a, b in zip(pyramid(x), pyramid(y))
        )
    )


def test_lap_loss_matches_reference(rng):
    import torch

    H = W = 64
    a = rng.uniform(size=(H, W, 3)).astype(np.float32)
    b = rng.uniform(size=(H, W, 3)).astype(np.float32)
    ours = float(lap_loss(a, b))
    theirs = _torch_lap_loss(
        torch.from_numpy(a.transpose(2, 0, 1))[None],
        torch.from_numpy(b.transpose(2, 0, 1))[None],
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_lap_loss_zero_on_identical(rng):
    a = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    assert float(lap_loss(a, a)) == 0.0
