import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding logic
# is exercised without TPU hardware (the driver separately dry-runs the real
# multi-chip path). Must be set before jax import.
os.environ["JAX_PLATFORMS"] = "cpu"  # the image presets JAX_PLATFORMS=axon
# Skip axon PJRT registration (sitecustomize dials the TPU relay at python
# startup — minutes of stall that CPU tests don't need). Harmless if unset.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
