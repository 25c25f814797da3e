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
    SpacetimeEmbedder,
    composed_xyzt,
    depth_embedder,
    empty_embedder,
    noop_embedder,
    positional_encoding,
    sh_dir_encoding,
)
from envgs_tpu.models.regressors import (
    MLP,
    DisplacementRegressor,
    ImageBasedRegressor,
    ImageBasedSphericalHarmonics,
    ResidualRegressor,
    SE3Regressor,
    SplitRegressor,
    contract,
    empty_regressor,
    noop_regressor,
    spherical_harmonics_apply,
    zero_regressor,
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
EMBEDDERS.register(ibr_embedder, name="GeometryImageBasedEmbedder")
EMBEDDERS.register(empty_embedder, name="EmptyEmbedder")
EMBEDDERS.register(noop_embedder, name="NoopEmbedder")
EMBEDDERS.register(sh_dir_encoding, name="TcnnDirEmbedder")  # SH encoding
EMBEDDERS.register(SpacetimeEmbedder, name="SpacetimeEmbedder")
EMBEDDERS.register(depth_embedder, name="DepthEmbedder")

# --- REGRESSORS (easyvolcap/models/networks/regressors/) -------------------
REGRESSORS.register(MLP, name="MlpRegressor")
REGRESSORS.register(MLP, name="TcnnMlpRegressor")  # same math, XLA
REGRESSORS.register(SplitRegressor, name="SplitRegressor")
REGRESSORS.register(SplitRegressor, name="TcnnSplitRegressor")
REGRESSORS.register(spherical_harmonics_apply, name="SphericalHarmonics")
REGRESSORS.register(contract, name="ContractRegressor")
REGRESSORS.register(empty_regressor, name="EmptyRegressor")
REGRESSORS.register(noop_regressor, name="NoopRegressor")
REGRESSORS.register(zero_regressor, name="ZeroRegressor")
REGRESSORS.register(DisplacementRegressor, name="DisplacementRegressor")
REGRESSORS.register(ResidualRegressor, name="ResidualRegressor")
REGRESSORS.register(SE3Regressor, name="SE3Regressor")
REGRESSORS.register(ImageBasedRegressor, name="ImageBasedRegressor")
REGRESSORS.register(ImageBasedSphericalHarmonics,
                    name="ImageBasedSphericalHarmonics")
REGRESSORS.register(NeusConfig, name="SDFRegressor")  # SDF field lives here
REGRESSORS.register(NeusConfig, name="ColorRegressor")
REGRESSORS.register(NeusConfig, name="SingleVarianceRegressor")  # inv_s

# --- RENDERERS (easyvolcap/models/renderers/) ------------------------------
RENDERERS.register(volume_render, name="VolumeRenderer")
