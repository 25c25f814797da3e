"""Model components are buildable by reference registry names
(easyvolcap/engine/__init__.py:40-60 taxonomy)."""
import envgs_tpu.models  # noqa: F401 — triggers registrations
from envgs_tpu.engine import EMBEDDERS, NETWORKS, REGRESSORS, RENDERERS, SAMPLERS


def test_reference_names_registered():
    for reg, names in [
        (SAMPLERS, ["EnvGSSampler", "Gaussian2DSampler", "GaussianTSampler",
                    "UniformSampler", "ImportanceSampler"]),
        (NETWORKS, ["VolumetricVideoNetwork", "MultilevelNetwork"]),
        (EMBEDDERS, ["PositionalEncodingEmbedder", "HashEmbedder",
                     "LatentCodeEmbedder", "ComposedXyztEmbedder"]),
        (REGRESSORS, ["MlpRegressor", "SplitRegressor", "SphericalHarmonics",
                      "ContractRegressor"]),
        (RENDERERS, ["VolumeRenderer"]),
    ]:
        for n in names:
            assert n in reg, f"{n} missing from {reg.name}"


def test_build_filters_kwargs():
    cfg = SAMPLERS.build(dict(type="GaussianTSampler", sh_degree=2,
                              not_a_field=1))
    assert cfg.sh_degree == 2
    net = NETWORKS.build(dict(type="VolumetricVideoNetwork", width=64))
    assert net.width == 64
    assert SAMPLERS.build(dict(type=None)) is None
