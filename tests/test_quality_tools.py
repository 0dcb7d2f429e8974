"""Regression tests for the quality-study tooling: the results merger's
side-aware semantics and the md writer's selective-legs rendering.

The study runs legs selectively across rounds/hosts and merges
(scripts/merge_quality_results.py); these tools feed QUALITY.md, so
their edge cases (split --tr-sides runs, components with zero paired
seeds) get the same regression coverage as the framework itself."""
import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _dump(tmp_path, name, obj):
    p = str(tmp_path / name)
    with open(p, "w") as f:
        json.dump(obj, f)
    return p


def test_merge_fills_sides_never_clobbers(tmp_path):
    """--tr-sides split runs carry one stack's leg with the other side
    empty; merging must fill sides and never clobber a populated side
    with {} — while later files still win for re-run legs."""
    m = _load("merge_quality_results")
    a = _dump(tmp_path, "a.json",
              {"0": {"transformer": {"jax": {"f": 1.0}, "torch": {}}}})
    b = _dump(tmp_path, "b.json",
              {"0": {"transformer": {"jax": {}, "torch": {"f": 2.0}}}})
    merged = m.merge([a, b])
    assert merged[0]["transformer"] == {"jax": {"f": 1.0},
                                        "torch": {"f": 2.0}}

    # a later re-run of the same side wins; the other side survives
    c = _dump(tmp_path, "c.json",
              {"0": {"transformer": {"jax": {"f": 9.0}, "torch": {}}}})
    merged = m.merge([a, b, c])
    assert merged[0]["transformer"] == {"jax": {"f": 9.0},
                                        "torch": {"f": 2.0}}

    # distinct seeds and non-side components pass through untouched
    d = _dump(tmp_path, "d.json",
              {"1": {"roundtrip": {"export_bit_equal": True}}})
    merged = m.merge([a, d])
    assert merged[1]["roundtrip"] == {"export_bit_equal": True}


def test_write_quality_md_renders_unrun_legs_as_not_run(tmp_path):
    """A classifier-only merged file has zero paired transformer seeds;
    the report must render those rows 'not run' and still PASS on the
    legs that ran — not fail the contract on nan deltas."""
    qs = _load("quality_study")
    metrics = {"val/f1_score_mean": 0.8, "test/f1_score_mean": 0.81}
    results = {0: {"mlp_raw": {"jax": dict(metrics),
                               "torch": dict(metrics)}}}
    out = str(tmp_path / "q.md")
    ok = qs.write_quality_md(results, out)
    text = open(out).read()
    assert ok is True
    assert "PASS" in text and "FAIL" not in text
    assert "nan" not in text
    # the transformer rows render as explicitly not run, 0 seeds
    assert any("Transformer" in ln and "not run" in ln
               for ln in text.splitlines())
