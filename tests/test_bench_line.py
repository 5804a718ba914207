"""bench.py stdout contract: the driver tail-captures stdout and parses
the LAST line as JSON, so the final line must stay under ~1 KB even when
every extended section completed (BENCH_r03 rc=124 and BENCH_r04
parsed:null were both violations of this contract — VERDICT r04 task 2).

Imports bench.py for its pure helpers only (no TPU touched).
"""
import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _worst_case_result():
    """A result dict with every section populated at realistic magnitudes
    (values mirror BENCH_r02/EVAL_r06 shapes) plus the long prose fields
    that blew up the old final line — those must NOT reach stdout."""
    return {
        "metric": "train_rays_per_sec_per_chip",
        "value": 55978.3,
        "unit": "rays/s",
        "vs_baseline": 0.056,
        "spread_pct": 0.24,
        "train_mfu": 0.5123,
        "train_gflop_per_ray": 4.064,
        "compute_ceiling_rays_per_sec": 108960.0,
        "inference_rays_per_sec": 175269.1,
        "inference_spread_pct": 0.02,
        "inference_mfu": 0.5339,
        "config": "D8 W512 N128 K32 flows4 bf16 train={...} infer={...}",
        "sections_completed": [
            "flagship_train", "flagship_infer", "serving_point",
            "occ_train", "operating_point", "student_point"],
        "sections_skipped_budget": ["student_point"],
        "note": "x" * 400,
        "serving_point": {
            "n_samples_placed": 16, "n_candidates": 64, "net_width": 384,
            "impl": "proposal",
            "inference_rays_per_sec": 1574843.9,
            "train_rays_per_sec": 635123.4,
            "vs_north_star": 1.5748,
            "config": "infer={...}",
            "quality_evidence": "y" * 300,
            "train_quality_evidence": "z" * 400,
            "floor_recovery_r12": {"N16_f0.30_nll": -5.957},
            "curve_r06": {"N16_f0.30": {"rays_per_sec": 1372942}},
        },
        "operating_point": {
            "n_samples": 48,
            "train_rays_per_sec": 145083.2,
            "train_mfu": 0.51,
            "inference_rays_per_sec": 440387.5,
            "inference_mfu": 0.53,
            "config": "train={...} infer={...}",
            "quality_evidence": "EVAL_r04.json",
        },
        "student_point": {
            "n_samples": 48, "net_width": 384,
            "train_rays_per_sec": 178713.9,
            "inference_rays_per_sec": 555441.0,
            "config": "train={...} infer={...}",
            "quality_evidence": "EVAL_r05.json",
        },
    }


def test_compact_line_fits_and_parses():
    bench = _load_bench()
    line = bench.compact_bench_line(_worst_case_result())
    assert len(line) <= 1024
    assert "\n" not in line
    parsed = json.loads(line)
    assert parsed["metric"] == "train_rays_per_sec_per_chip"
    assert parsed["value"] == 55978.3
    assert parsed["serving_point"]["inference_rays_per_sec"] == 1574843.9
    assert parsed["full"] == "BENCH_full.json"
    # the prose fields must stay in BENCH_full.json only
    assert "note" not in parsed
    assert "quality_evidence" not in json.dumps(parsed)


def test_compact_line_headline_only_subset():
    bench = _load_bench()
    minimal = {"metric": "train_rays_per_sec_per_chip", "value": 1.0,
               "unit": "rays/s", "vs_baseline": 0.0,
               "sections_completed": ["flagship_train"]}
    parsed = json.loads(bench.compact_bench_line(minimal))
    assert parsed["value"] == 1.0
    assert "serving_point" not in parsed
