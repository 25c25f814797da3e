import os

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.train import checkpoints as C
from envgs_tpu.train.trainer import init_train_state
from tests.test_envgs_model import _pools


def _state(seed=0):
    base, env = _pools(seed=seed)
    return init_train_state(base, env, jax.random.PRNGKey(seed))


def test_save_load_roundtrip(tmp_path):
    st = _state()
    # dirty some state so the roundtrip is meaningful
    st = st._replace(
        base=st.base._replace(
            stats=st.base.stats._replace(
                weight_accum=st.base.stats.weight_accum + 3.0,
                sh_degree=jnp.asarray(2, jnp.int32),
            )
        )
    )
    p = str(tmp_path / "latest.npz")
    C.save_checkpoint(p, st, it=123)
    st2, it = C.load_checkpoint(p, st.base.cap, st.env.cap)
    assert it == 123
    np.testing.assert_allclose(
        np.asarray(st2.base.params.xyz), np.asarray(st.base.params.xyz)
    )
    assert int(st2.base.stats.sh_degree) == 2
    assert int(st2.base.n_active) == int(st.base.n_active)
    # active-slot stats preserved (compacted save re-padded on load)
    act = np.asarray(st.base.stats.active)
    np.testing.assert_allclose(
        np.asarray(st2.base.stats.weight_accum)[np.asarray(st2.base.stats.active)],
        np.asarray(st.base.stats.weight_accum)[act],
    )


def test_capacity_change_on_load(tmp_path):
    st = _state()
    p = str(tmp_path / "latest.npz")
    C.save_checkpoint(p, st, it=5)
    st2, _ = C.load_checkpoint(p, st.base.cap * 2, st.env.cap * 2)
    assert st2.base.cap == st.base.cap * 2
    assert int(st2.base.n_active) == int(st.base.n_active)


def test_keep_last_rotation(tmp_path):
    st = _state()
    for i in [100, 200, 300, 400, 500]:
        C.save_checkpoint(str(tmp_path / f"{i}.npz"), st, it=i, keep=3)
    names = sorted(f for f in os.listdir(tmp_path) if f.endswith(".npz"))
    assert names == ["300.npz", "400.npz", "500.npz"]


def test_find_latest(tmp_path):
    st = _state()
    C.save_checkpoint(str(tmp_path / "100.npz"), st, it=100)
    C.save_checkpoint(str(tmp_path / "700.npz"), st, it=700)
    assert C.find_latest(str(tmp_path)).endswith("700.npz")
    C.save_checkpoint(str(tmp_path / "latest.npz"), st, it=900)
    assert C.find_latest(str(tmp_path)).endswith("latest.npz")
    assert C.find_latest(str(tmp_path / "missing")) is None


def test_ply_export_import(tmp_path):
    st = _state()
    p = str(tmp_path / "gs.ply")
    C.export_ply(st.base, p)
    pool = C.import_ply(p, cap=256, sh_degree=2)
    assert int(pool.n_active) == int(st.base.n_active)
    act_src = np.asarray(st.base.stats.active)
    np.testing.assert_allclose(
        np.asarray(pool.params.xyz)[: int(pool.n_active)],
        np.asarray(st.base.params.xyz)[act_src],
        atol=1e-6,
    )
