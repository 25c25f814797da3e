"""Model-layer registrations.

Maps the reference's registry component names
(/root/reference/easyvolcap/engine/__init__.py:40-60 +
`@REGISTRY.register_module()` sites under easyvolcap/models/) onto this
framework's functional constructors, so configs with `type: <name>` build
the same components by name. The registered objects are the static config
NamedTuples / pure functions of the functional design — `Registry.build`
filters config kwargs against their signatures exactly like the reference's
build_from_cfg.
"""
from envgs_tpu.engine import (
    EMBEDDERS,
    NETWORKS,
    REGRESSORS,
    RENDERERS,
    SAMPLERS,
)
from envgs_tpu.models.enerf import ENeRFConfig
from envgs_tpu.models.envgs import EnvGSConfig
from envgs_tpu.models.gaussiant import GaussianTConfig
from envgs_tpu.models.nerf import NerfConfig, importance_z_vals, uniform_z_vals, volume_render
from envgs_tpu.models.embedders import (
    DeformationEmbedder,
    HashEmbedder,
    KPlanesEmbedder,
    LatentCodeEmbedder,
    composed_xyzt,
    positional_encoding,
)
from envgs_tpu.models.regressors import (
    MLP,
    SplitRegressor,
    contract,
    spherical_harmonics_apply,
)

# --- SAMPLERS (easyvolcap/models/samplers/) --------------------------------
SAMPLERS.register(EnvGSConfig, name="EnvGSSampler")
SAMPLERS.register(EnvGSConfig, name="Gaussian2DSampler")  # base-pass subset
SAMPLERS.register(GaussianTConfig, name="GaussianTSampler")
SAMPLERS.register(uniform_z_vals, name="UniformSampler")
SAMPLERS.register(importance_z_vals, name="ImportanceSampler")
SAMPLERS.register(ENeRFConfig, name="CostVolumeSampler")
from envgs_tpu.models.point_planes import PointPlanesConfig  # noqa: E402
SAMPLERS.register(PointPlanesConfig, name="PointPlanesSampler")
from envgs_tpu.models.stgs import STGSConfig  # noqa: E402
SAMPLERS.register(STGSConfig, name="STGSModel")  # spacetime gaussians
SAMPLERS.register(STGSConfig, name="FDGSSampler")  # fdgs render alias

# --- NETWORKS (easyvolcap/models/networks/) --------------------------------
NETWORKS.register(NerfConfig, name="VolumetricVideoNetwork")
NETWORKS.register(NerfConfig, name="MultilevelNetwork")  # separate_levels=True
from envgs_tpu.models.neus import NeusConfig  # noqa: E402
NETWORKS.register(NeusConfig, name="NeusNetwork")

# --- EMBEDDERS (easyvolcap/models/networks/embedders/) ---------------------
EMBEDDERS.register(positional_encoding, name="PositionalEncodingEmbedder")
EMBEDDERS.register(positional_encoding, name="AnnealPositionalEncodingEmbedder")
EMBEDDERS.register(HashEmbedder, name="HashEmbedder")
EMBEDDERS.register(HashEmbedder, name="TcnnHashEmbedder")  # same math, XLA
EMBEDDERS.register(LatentCodeEmbedder, name="LatentCodeEmbedder")
EMBEDDERS.register(composed_xyzt, name="ComposedXyztEmbedder")
EMBEDDERS.register(KPlanesEmbedder, name="KPlanesEmbedder")
EMBEDDERS.register(DeformationEmbedder, name="DeformationEmbedder")
from envgs_tpu.models.embedders import ibr_embedder  # noqa: E402
EMBEDDERS.register(ibr_embedder, name="ImageBasedEmbedder")

# --- REGRESSORS (easyvolcap/models/networks/regressors/) -------------------
REGRESSORS.register(MLP, name="MlpRegressor")
REGRESSORS.register(SplitRegressor, name="SplitRegressor")
REGRESSORS.register(spherical_harmonics_apply, name="SphericalHarmonics")
REGRESSORS.register(contract, name="ContractRegressor")

# --- RENDERERS (easyvolcap/models/renderers/) ------------------------------
RENDERERS.register(volume_render, name="VolumeRenderer")
