"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the remote `axon` TPU backend in
every python process and sets jax.config.jax_platforms = "axon,cpu", which
both overrides the JAX_PLATFORMS env var and can stall for minutes while the
TPU tunnel is claimed. Tests must run hermetically on CPU, so we override
the *config* (not just the env) before any backend is initialized.

Multi-chip sharding is validated on ``xla_force_host_platform_device_count=8``
CPU devices; the real-TPU path is exercised by bench.py / the driver.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is XLA:CPU *compile*-dominated (programs run for milliseconds
# after seconds of compilation on this 1-vCPU host); backend optimization
# level 0 cuts compile time ~20% end-to-end and changes no assertion —
# tests pin correctness, never speed. Benches/production never set this.
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import pytest  # noqa: E402

# must beat xla_bridge backend initialization; the sitecustomize already set
# jax_platforms to "axon,cpu" at interpreter start.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent XLA compilation cache: the quick subset is dominated by
# compile time (most tests compile >1 s of programs once and run them in
# milliseconds). Cache keys include the HLO module + compiler version, so
# edited code recompiles and unchanged programs replay — warm reruns of
# the quick subset drop from ~5 min to well under the 3-min inner-loop
# budget. Override the location with DIFFGFDN_JAX_CACHE_DIR; set it empty
# to disable.
_cache_dir = os.environ.get(
    "DIFFGFDN_JAX_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), ".jax_cache"),
)
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


# Central slow-test policy: long integration tests (>= ~9 s, mostly XLA
# compile time) are marked `slow` here so `-m 'not slow'` gives a quick
# default subset.
SLOW_TESTS = {
    "test_band_parallel_cli_honours_per_band_architectures",
    "test_colorless_warm_start_through_solver",
    "test_directional_solver_runs",
    "test_synthesized_rirs_decay",
    "test_dryrun_is_hermetic_wrt_default_device",
    "test_band_parallel_early_stop_per_band",
    "test_fit_indexed_resume_fresh_process",
    "test_infer_from_checkpoint_and_export",
    "test_band_parallel_cli_and_inference",
    "test_fit_indexed_resume",
    "test_csolve1_pallas_matches_gj_and_grads",
    "test_time_domain_synthesis_svf_head_matches_freq_path",
    "test_var_receiver_training_with_absorption_filters",
    "test_var_receiver_pos_training_with_colorless_loss",
    "test_band_parallel_training_step",
    "test_time_domain_synthesis_matches_freq_path_filtered_absorption",
    "test_pallas_cinv_matches_numpy",
    "test_single_pos_svf_head_with_reg_loss",
    "test_learnable_decay_times_training",
    "test_var_receiver_pos_training_runs_and_improves",
    "test_band_parallel_colorless_loss_terms",
    "test_cnn_training_path",
    "test_band_parallel_fit_indexed",
    "test_polynomial_matrix_plots",
    "test_freq_sharded_single_pos_step",
    "test_single_pos_training",
    "test_filter_coupling_paraunitary_loop",
    "test_var_receiver_pos_svf_forward",
    "test_sample_rate_mismatch_raises",
    "test_walkthrough_end_to_end",
    "test_single_pos_cli_auto_freq_parallel",
    # round-3 quick-subset budget cut (< 3 min): integration-grade tests
    # whose assertions the full suite (-m '') still runs
    "test_precomputed_band_features_jitted_multidevice",
    "test_precomputed_features_fit_on_single_device_mesh",
    "test_rirs_with_direct_cs_amplitudes",
    "test_save_true_irs_option",
    "test_rirs_with_amplitudes_colorless_model_and_validation",
    "test_amplitude_injection_reproduces_head_outputs",
    "test_update_masking_freezes_stopped_bands",
    "test_colorless_fdn_training_reduces_loss",
    "test_pallas_sos_gradients_match_xla",
    "test_time_domain_synthesis_filter_coupling_scalar_gains",
    "test_time_domain_synthesis_directional_matches_freq_path",
    "test_group_pooled_transfer_function_matches_generic",
    "test_trained_model_spatial_inference",
    "test_var_receiver_scalar_fast_path_matches_general",
    "test_var_source_receiver_scalar_fast_path_matches_general",
    "test_precomputed_band_features_match_slow_path",
    "test_directional_loss_matmul_irfft_matches_native",
    "test_directional_prediction_matches_targets_better_after_training",
    "test_pallas_cinv_gradient_via_custom_vjp",
    "test_csolve1_pallas_gradients_match_xla",
    "test_csolve1_pallas_block_shapes",
    "test_lut_apply_is_transposed_solve",
    "test_pallas_cinv_needs_pivoting",
    "test_directional_mlp_training_improves",
    "test_gradients_finite_with_zero_b0_section",
    # round 4
    "test_band_parallel_full_loss_stack_matches_sequential",
    "test_training_convergence_parity_with_torch_reference",
    "test_compare_baselines_workflow",
    # round-4 quick-budget cut: the driver itself runs dryrun_multichip(8)
    # every round (MULTICHIP_rN.json), so the quick set keeps only the
    # cheap entry()/rejection contracts; the profile-dir CLI run duplicates
    # test_single_pos_cli_auto_freq_parallel's train except for the
    # profiler wrap.
    "test_dryrun_multichip_8_cpu_mesh",
    "test_single_pos_cli_profile_dir",
    # scan-vs-loop parity stays covered in the quick set by the spatial
    # twin (test_spatial_fit_indexed_scan_matches_per_step); this GFDN
    # variant compiles both paths twice and is the quick set's slowest test
    "test_scan_epoch_matches_per_step",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
