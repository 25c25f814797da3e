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
# round-1 #6). Tests measured > ~15 s on this image's single CPU core are
# marked slow by NAME here (one place, no per-file decorators); every
# component keeps at least one fast test. Full-suite runtime: ~23 min.
# ---------------------------------------------------------------------------
_SLOW_TESTS = {
    "test_band_parallel_matches_single_chip",
    "test_band_parallel_camopt_and_base_tracing",
    "test_training_recovers_motion",
    "test_linear_motion_moves_projection",
    "test_forward_and_motion_fit",
    "test_train_convergence_and_depth",
    "test_render_shapes_and_depth_sweep",
    "test_render_and_train_convergence",
    "test_point_planes_family_from_config",
    "test_enerf_family_from_config",
    "test_nerf_family_from_config",
    "test_neus_family_from_config",
    "test_tiled_tracer_grad_parity",
    "test_train_step_improves_psnr",
    "test_forward_shapes_and_composition",
    "test_render_mode_matches_training_forward",
    "test_grad_parity",  # raster_pallas + raster3d
    "test_neus_learns_sphere_sdf",
    "test_kplanes_dynamic_radiance_field",
    "test_render_mode_unaligned_parity",
    "test_colmap_roundtrip_to_training",
    "test_camera_opt_recovers_pose",
    "test_ray_mask_culls_but_matches_unmasked_pixels",
    "test_empty_scene",
    "test_autodiff_flows",
    "test_base_tracing_close_to_raster",
    "test_base_tracing_train_step_grads",
    "test_nerf_overfits_tiny_batch",
    "test_kplanes_embedder",
    "test_rowcull_actually_culls",
    "test_temporal_marginal_gates_opacity",
    "test_render_rays_deterministic_eval",
    "test_reflection_gate",
    "test_lpips_weight_roundtrip",
    "test_padded_pool_mask",
    "test_recorder",
    "test_two_splats_occlusion_order",
    "test_runner_adaptive_pair_cap_growth",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        base = item.name.split("[")[0]
        if base in _SLOW_TESTS:
            item.add_marker(_pytest.mark.slow)
