import os
import sys

# Force a deterministic 8-device CPU mesh for all tests; TPU tests are
# driven separately by bench.py on real hardware.
#
# Env mutation alone is NOT enough here: the axon sitecustomize imports
# jax at interpreter startup (before conftest runs), so jax's config has
# already captured JAX_PLATFORMS=axon from the kernel env — a later
# os.environ write is silently ignored and the suite would run on the
# tunneled TPU backend (where e.g. the fused Pallas head kernel kicks in
# and bf16/f32 comparisons see different hardware-PRNG dropout masks).
# jax.config.update rebinds the platform as long as no backend has been
# initialized yet, which is guaranteed this early in the pytest run.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # skip the axon TPU plugin
os.environ["JAX_PLATFORMS"] = "cpu"
# The kernel library now loads the committed chip-tuned logs by default
# (ops/kernel_library.py::default_library). Tests pin dispatch OFF so the
# CPU suite exercises the hand-default code paths deterministically;
# library behavior itself is covered by test_kernel_library.py, which
# sets the env var explicitly per test.
os.environ.setdefault("VES_KERNEL_LIBRARY", "none")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (must come after the env setup above)

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CI_LOGS = "/root/reference/tutorials/auto_scheduler/ci_logs"


# ---------------------------------------------------------------------------
# Test tiers (VERDICT r3 weak #1): `pytest -m fast` is the <2-minute
# tier for inner-loop development; `pytest -m slow` (or no marker) runs
# the full battery (~25-50 min on this 1-core host depending on
# contention; tools/validate_all.sh drives it in batches).  The list
# below is every test that took >5 s in the 2026-08-20 full-suite
# timing run (/tmp replicated in docs/ROUND_NOTES.md); tests absent
# from it default to the fast tier.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

SLOW_TESTS = {
    "test_aux.py::test_few_shot_maml_mode",
    "test_aux.py::test_hyperparameter_opt_tpe_end_to_end",
    "test_aux.py::test_lgbm_bayesian_hpo_end_to_end",
    "test_boost.py::test_boost_tpu_all_binary_corpus",
    "test_boost.py::test_boost_tpu_foreign_eval_set_and_early_stop",
    "test_boost.py::test_boost_tpu_kron_engine_parity",
    "test_boost.py::test_boost_tpu_matches_numpy_engine_plain",
    "test_boost.py::test_boost_tpu_pack_cache_releases_device_memory",
    "test_boost.py::test_boost_tpu_pack_sum_protocol_parity",
    "test_boost.py::test_boost_tpu_pallas_histogram_engine_parity",
    "test_boost.py::test_boost_tpu_scan_path_callback_parity",
    "test_boost.py::test_boost_tpu_sharded_matches_single_device",
    "test_boost.py::test_boost_tpu_sharded_tiered_matches_single_device",
    "test_boost.py::test_boost_tpu_tiered_histograms_parity",
    "test_boost.py::test_boost_tpu_weighted_pack_sum_parity",
    "test_boost.py::test_gbdt_native_tpu_engine_selection",
    "test_boost.py::test_hist_pallas_kron_bit_identical",
    "test_boost.py::test_load_model_pickle_dispatches_by_family",
    "test_fleet.py::test_fleet_master_workers_gather",
    "test_fleet.py::test_worker_warmup_and_measurer_smoke",
    "test_frontend.py::test_traced_bert_matches_static_table",
    "test_frontend.py::test_traced_model_matches_static_table[vgg_16-shape9]",
    "test_measure_bridge.py::test_command_runner_repeat_contract",
    "test_measure_bridge.py::test_command_runner_round_trip",
    "test_measure_bridge.py::test_tune_vae_loop_with_command_runner",
    "test_models.py::test_blocked_kcenter_matches_full",
    "test_models.py::test_entmax15_properties",
    "test_models.py::test_entmax_axis_argument",
    "test_models.py::test_fit_checkpoint_resume",
    "test_models.py::test_fused_head_kernel_interpret_matches_jax",
    "test_models.py::test_fused_head_kernel_shape_grid",
    "test_models.py::test_init_mode_alternatives",
    "test_models.py::test_mc_dropout_variance_positive",
    "test_models.py::test_mlp_scan_fit_bf16_storage",
    "test_models.py::test_mlp_scan_fit_matches_host_loop",
    "test_models.py::test_predictor_fit_reduces_loss_and_encoder_transfer",
    "test_models.py::test_segment_vae_cost_model_learns",
    "test_models.py::test_select_bf16_agrees_with_f32",
    "test_models.py::test_select_programs_end_to_end",
    "test_models.py::test_sequence_model_variants_learn[lstm]",
    "test_models.py::test_sequence_model_variants_learn[mha]",
    "test_models.py::test_sequence_model_variants_learn[tabnet]",
    "test_models.py::test_tabnet_ghost_batchnorm_state",
    "test_models.py::test_vae_hyperparameter_search",
    "test_models.py::test_vae_shapes_and_training_improves",
    "test_models.py::test_workload_embedding",
    "test_multihost.py::test_global_mesh_sweep_cli",
    "test_multihost.py::test_two_process_collective_compute",
    "test_multihost.py::test_two_process_distributed_shard_and_merge",
    "test_pallas_conv.py::test_conv_kernel_interpret_exact[cfg0]",
    "test_pallas_tuner.py::test_kernel_suite_scheduler_tunes_mixed_families",
    "test_pallas_tuner.py::test_online_active_search_measures_progressively",
    "test_pipeline.py::test_active_search_bucketed_shapes",
    "test_pipeline.py::test_active_search_center_ring_buffer",
    "test_pipeline.py::test_active_search_on_device_mesh",
    "test_pipeline.py::test_encoder_lineage_arms_find_optimum",
    "test_pipeline.py::test_learned_model_search_quality",
    "test_pipeline.py::test_precompacted_centers_match_mask_derived",
    "test_pipeline.py::test_sharded_fused_selection_matches_single_device",
    "test_pipeline.py::test_sharded_selection_xla_fallback_two_axis_mesh",
    "test_pipeline.py::test_sharded_topk_and_gathers_match_reference",
    "test_pipeline.py::test_shared_vae_pretrain_matches_in_loop_training",
    "test_pipeline.py::test_task_scheduler_round_robin_and_gradient",
    "test_pipeline.py::test_transfer_tune_plus_mix_refit",
    "test_platforms.py::test_measure_programs_cli_per_platform_folders",
    "test_sketch_goldens.py::test_reference_states_reachable_by_generator[resnet-18-NHWC-B1-cuda.json]",
    "test_sketch_goldens.py::test_reference_states_reachable_by_generator[resnet-50-NHWC-B1-llvm.json]",
    # all parametrizations: population self-goldens, ~5-20s each —
    # tools/sketch_fingerprints.py regenerates on intentional generator
    # changes
    "test_sketch_goldens.py::test_population_fingerprint_golden",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: >5s on the 1-core host; excluded from -m fast")
    config.addinivalue_line(
        "markers", "fast: the <2-minute inner-loop tier (-m fast)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = item.nodeid.split("/")[-1]
        base = key.split("[")[0]
        if key in SLOW_TESTS or base in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)
