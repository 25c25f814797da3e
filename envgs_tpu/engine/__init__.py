from envgs_tpu.engine.config import Config, load_config, merge_dotted
from envgs_tpu.engine.registry import Registry

# Global registries, mirroring the reference's component taxonomy
# (/root/reference/easyvolcap/engine/__init__.py:40-60). Components register
# with @REGISTRY.register() and are built by name from config dicts.
DATASETS = Registry("datasets")
DATALOADERS = Registry("dataloaders")
DATASAMPLERS = Registry("datasamplers")
MODELS = Registry("models")
CAMERAS = Registry("cameras")
SAMPLERS = Registry("samplers")
NETWORKS = Registry("networks")
EMBEDDERS = Registry("embedders")
REGRESSORS = Registry("regressors")
RENDERERS = Registry("renderers")
SUPERVISORS = Registry("supervisors")
RUNNERS = Registry("runners")
OPTIMIZERS = Registry("optimizers")
SCHEDULERS = Registry("schedulers")
MODERATORS = Registry("moderators")
RECORDERS = Registry("recorders")
EVALUATORS = Registry("evaluators")
VISUALIZERS = Registry("visualizers")
# model-family training entry points, keyed by the reference sampler /
# network registry names (the CLI's `type:`-driven dispatch)
TRAINERS = Registry("trainers")

__all__ = [
    "Config", "load_config", "merge_dotted", "Registry",
    "DATASETS", "DATALOADERS", "DATASAMPLERS", "MODELS", "CAMERAS",
    "SAMPLERS", "NETWORKS", "EMBEDDERS", "REGRESSORS", "RENDERERS",
    "SUPERVISORS", "RUNNERS", "OPTIMIZERS", "SCHEDULERS", "MODERATORS",
    "RECORDERS", "EVALUATORS", "VISUALIZERS", "TRAINERS",
]
