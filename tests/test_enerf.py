"""ENeRF image-based family: cost-volume plane-sweep correctness +
photometric training convergence on a textured-plane scene
(cost_volume_sampler.py capability)."""
import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.models.enerf import (
    ENeRFConfig,
    init_enerf,
    make_enerf_train_step,
    render_enerf,
)
from envgs_tpu.utils.camera import make_camera
import pytest

Z_PLANE = 2.0


def _tex(x, y):
    """Smooth RGB texture over world (x, y) on the z=Z_PLANE plane."""
    r = 0.5 + 0.5 * np.sin(3.1 * x) * np.cos(2.3 * y)
    g = 0.5 + 0.5 * np.sin(2.2 * x + 1.0)
    b = 0.5 + 0.5 * np.cos(2.7 * y + 0.5)
    return np.stack([r, g, b], -1).astype(np.float32)


def _plane_views(n=4, H=48, W=48, f=60.0):
    """Cameras translated along x, all looking +z at the textured plane."""
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    cams, imgs = [], []
    jj, ii = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    for i in range(n):
        cx = (i - (n - 1) / 2) * 0.15
        T = np.array([-cx, 0, 0], np.float32)  # world origin shift
        cam = make_camera(H, W, K, np.eye(3, dtype=np.float32), T)
        # pixel -> world point on the z=Z_PLANE plane
        xw = (jj - K[0, 2]) / f * Z_PLANE + cx
        yw = (ii - K[1, 2]) / f * Z_PLANE
        cams.append(cam)
        imgs.append(_tex(xw, yw))
    return cams, np.stack(imgs)


@pytest.mark.slow
def test_render_shapes_and_depth_sweep():
    cfg = ENeRFConfig(n_planes=(32, 8), n_samples=4)
    cams, imgs = _plane_views()
    params = init_enerf(cfg, jax.random.PRNGKey(0))
    out = render_enerf(cfg, params, cams[1], jnp.asarray(imgs[[0, 2, 3]]),
                       [cams[0], cams[2], cams[3]], near=1.0, far=4.0)
    H, W = cams[1].H, cams[1].W
    assert out.rgb_map.shape == (H, W, 3)
    assert out.dpt_map.shape == (H, W)
    assert bool(jnp.isfinite(out.rgb_map).all())
    assert bool(jnp.isfinite(out.depth_coarse).all())
    # hypotheses bracket the plane; regression stays in range
    d = np.asarray(out.depth_coarse)
    assert d.min() >= 1.0 - 1e-4 and d.max() <= 4.0 + 1e-4


@pytest.mark.slow
def test_train_convergence_and_depth():
    cfg = ENeRFConfig(n_planes=(24, 6), n_samples=3)
    cams, imgs = _plane_views(n=4)

    def batch(tgt_i):
        src_is = [i for i in range(4) if i != tgt_i]
        return (
            jnp.asarray(cams[tgt_i].K), cams[tgt_i].R, cams[tgt_i].T,
            jnp.asarray(imgs[src_is]),
            jnp.stack([jnp.asarray(cams[i].K) for i in src_is]),
            jnp.stack([cams[i].R for i in src_is]),
            jnp.stack([cams[i].T for i in src_is]),
            jnp.asarray(imgs[tgt_i]),
        )

    init, step = make_enerf_train_step(cfg, cams[0], 3,
                                       near=1.0, far=4.0, lr=1e-3)
    params, opt_state = init(jax.random.PRNGKey(1))
    hist = []
    # round-robin targets: generalization pressure forces correct depth
    for it in range(100):
        params, opt_state, aux = step(params, opt_state, *batch(it % 4))
        hist.append(float(aux["psnr"]))
    first = float(np.mean(hist[:4]))  # one full round of targets
    last = float(np.mean(hist[-4:]))
    assert np.isfinite(last)
    assert last > first + 1.0, (first, last)
    tgt_i = 1
    src_is = [0, 2, 3]
    src_imgs = jnp.asarray(imgs[src_is])

    # the cost volume localizes the plane depth (THE discriminating
    # property of a working plane-sweep: median within ~10% of truth)
    out = render_enerf(cfg, params, cams[tgt_i], src_imgs,
                       [cams[i] for i in src_is], near=1.0, far=4.0)
    d = np.asarray(out.depth_coarse)
    interior = d[2:-2, 2:-2]
    assert abs(float(np.median(interior)) - Z_PLANE) < 0.3, float(
        np.median(interior))


def test_ibr_embedder_standalone():
    """ImageBasedEmbedder: projected bilinear source features aggregated as
    mean/var with out-of-frustum exclusion (reference image_based_embedder
    semantics)."""
    import numpy as np
    import jax.numpy as jnp

    from envgs_tpu.models.embedders import ibr_embedder
    from envgs_tpu.engine import EMBEDDERS
    from envgs_tpu.utils.camera import make_camera

    H = W = 32
    f = 40.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    cams = [
        make_camera(H, W, K, np.eye(3, dtype=np.float32),
                    np.zeros(3, np.float32)),
        make_camera(H, W, K, np.eye(3, dtype=np.float32),
                    np.array([-0.2, 0, 0], np.float32)),
    ]
    # constant-valued feature maps: mean = value, var = 0 where both see it
    feats = jnp.stack([jnp.full((H, W, 4), 1.0), jnp.full((H, W, 4), 3.0)])
    pts = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, -5.0]])  # behind cam #2
    out = ibr_embedder(pts, feats, cams)
    assert out.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(out[0, :4]), 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[0, 4:]), 1.0, atol=1e-5)
    # the behind-camera point sees NO source: mean forced to 0 by masking
    np.testing.assert_allclose(np.asarray(out[1]), 0.0, atol=1e-5)
    stacked = ibr_embedder(pts, feats, cams, agg="stack")
    assert stacked.shape == (2, 2, 5)
    assert float(stacked[0, 0, -1]) == 1.0  # inside flags
    assert float(stacked[0, 1, -1]) == 0.0
    assert "ImageBasedEmbedder" in EMBEDDERS
