"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run without TPU hardware and must exercise multi-device sharding;
``xla_force_host_platform_device_count=8`` gives 8 virtual CPU devices in one
process (see SURVEY.md §4 "Distributed-without-a-cluster").

NOTE: the axon environment pins ``JAX_PLATFORMS=axon`` via sitecustomize, so a
``setdefault`` is not enough — we must overwrite the env var *and* set the
config after import (the sitecustomize runs before any of this).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache keeps repeated test runs fast
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# fast gate / slow split (the environment has ONE host core; the full suite is
# compile-bound at ~12-16 min warm). The tests below each took >14s in the
# 2026-08-19 `--durations` sweep; marking them here keeps the split in one
# place instead of scattering decorators. Fast gate:
#   python -m pytest tests/ -q -m "not slow"        (~6 min warm)
# Full suite (required before shipping):
#   python -m pytest tests/ -q                      (~12-16 min warm)

_SLOW_TESTS = {
    "test_multiprocess.py::test_two_process_sharded_train_matches_single_process",
    "test_multiprocess.py::test_four_process_data_plane_uneven_shards",
    "test_pretrained.py::test_pretrained_missing_weights_raises",
    "test_app_e2e.py::test_train_cli_end_to_end",
    "test_app_e2e.py::test_eval_cli_int8_kv_decode",
    "test_models.py::test_generate_matches_naive",
    "test_models.py::test_pre_norm_decoder_cached_decode_matches_parallel",
    "test_donut_eval.py::test_donut_eval_ocr_offline_end_to_end",
    "test_decode_attention.py::test_cross_attention_int8_cache_generate_parity",
    "test_framework.py::test_grad_accum_scan_matches_multisteps",
    "test_framework.py::test_grad_accum_multisteps",
    "test_framework.py::test_train_step_matches_single_device",
    "test_framework.py::test_resume_is_bit_identical_to_continuous_run",
    "test_framework.py::test_sharded_train_step_loss_decreases",
    "test_tasks.py::test_pix2struct_pretrain_task_end_to_end",
    "test_tasks.py::test_train_device_preprocess_matches_host_pipeline",
    "test_tasks.py::test_pretrain_train_time_reconstruction",
    "test_swin.py::test_flash_window_guard_falls_back_to_xla",
    "test_hf_dataset_flow.py::test_cord_finetune_via_hf_loader",
    "test_window_attention.py::test_swin_module_flash_matches_xla",
    "test_tasks.py::test_pix2struct_auto_remat_off_with_flash",
    "test_tasks.py::test_eval_generate_flash_matches_xla_encode",
    "test_tasks.py::test_pretrain_task_with_swin_encoder",
    "test_swin.py::test_swin_forward_shapes",
    "test_swin.py::test_swin_shifted_blocks_change_output",
    "test_models.py::test_remat_modes_match_no_remat_grads",
    "test_generation_beam.py::test_beam_search_score_dominates_greedy",
    "test_pretrained.py::test_pretrained_flag_wires_into_task_train_setup",
    "test_bench_contract.py::test_bench_last_stdout_line_is_full_record_and_budget_skips",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: >14s compile-heavy test, excluded from the fast gate"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        # nodeid is like "tests/test_x.py::test_y[param]"
        base = item.nodeid.split("/")[-1].split("[")[0]
        if base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
