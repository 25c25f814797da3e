import os
import sys

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding logic
# is exercised without TPU hardware (the driver separately dry-runs the real
# multi-chip path on a spawn-time CPU mesh).
#
# This image's interpreter-startup hook (sitecustomize on PYTHONPATH) dials
# the axon TPU backend whenever PALLAS_AXON_POOL_IPS is set — at interpreter
# startup, i.e. BEFORE this conftest runs. In-process os.environ mutation is
# therefore too late: jax.devices() stays bound to the single real TPU and
# every test runs minutes-slow through the relay (and the 8-device sharding
# tests fail their precondition). The only working recipe is to set the
# platform env at process spawn — so if we detect the axon hook fired, we
# re-exec pytest once with the corrected environment (in pytest_configure,
# after suspending pytest's global fd capture so the child's output reaches
# the terminal instead of the dead capture tempfile).
_MARK = "ENVGS_TPU_TESTENV"


def _want_env():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # sitecustomize: skip axon registration
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    env[_MARK] = "1"
    return env


def pytest_configure(config):
    if os.environ.get(_MARK) == "1":
        return
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        _want_env(),
    )


if os.environ.get(_MARK) != "1" and not os.environ.get(
    "PALLAS_AXON_POOL_IPS"
):
    # Clean interpreter (no axon hook): in-process env set still works as
    # long as jax has not been imported yet.
    os.environ.update({k: v for k, v in _want_env().items() if k != _MARK})


# ---------------------------------------------------------------------------
# Test tiers: `pytest -m "not slow"` is the < 5-minute fast tier (VERDICT
# round-1 #6, round-2 weak #2). Tests measured > ~15 s on this image's
# single CPU core carry @pytest.mark.slow IN THEIR OWN FILES (grep
# 'mark.slow' to audit which coverage the fast tier skips); every component
# keeps at least one fast test.
