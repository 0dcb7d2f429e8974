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


def test_write_quality_md_tripwire_learned_counts(tmp_path):
    """Per-class accuracies flag constant predictors: a (1.0, 0.0) leg
    must count as NOT learned, a (0.9, 0.4) leg as learned — F1 alone
    can't tell them apart (all-good scores 2p/(1+p))."""
    qs = _load("quality_study")
    learned = {"val/f1_score_mean": 0.8, "test/f1_score_mean": 0.81,
               "test/acc_good_mean": 0.9, "test/acc_bad_mean": 0.4}
    constant = {"val/f1_score_mean": 0.8, "test/f1_score_mean": 0.84,
                "test/acc_good_mean": 1.0, "test/acc_bad_mean": 0.0}
    results = {0: {"mlp_raw": {"jax": dict(learned),
                               "torch": dict(constant)}}}
    out = str(tmp_path / "q.md")
    qs.write_quality_md(results, out)
    text = open(out).read()
    assert "[jax] per-seed (acc_good, acc_bad)" in text
    assert "1/1 learned" in text      # the jax side
    assert "0/1 learned" in text      # the torch side (constant)


def test_write_quality_md_ref_scale_tripwire(tmp_path):
    """Ref-scale table: non-degeneracy counts by the tripwire when the
    fields exist, falls back to f1>0 for pre-tripwire JSONs."""
    qs = _load("quality_study")
    rs = {"backend": "tpu", "data": "x",
          "seeds": {"0": {"test/cl/f1_score": 0.84, "gen/loss": 1.5,
                          "test/cl/acc_good": 1.0,
                          "test/cl/acc_bad": 0.0},
                    "1": {"test/cl/f1_score": 0.83, "gen/loss": 1.4,
                          "test/cl/acc_good": 0.8,
                          "test/cl/acc_bad": 0.6}}}
    out = str(tmp_path / "q.md")
    qs.write_quality_md({}, out, ref_scale=rs)
    text = open(out).read()
    assert "1/2 seeds non-degenerate" in text
    assert "0.800 / 0.600" in text
    # pre-tripwire JSON: f1>0 fallback
    rs_old = {"backend": "tpu", "data": "x",
              "seeds": {"0": {"test/cl/f1_score": 0.84, "gen/loss": 1.5}}}
    qs.write_quality_md({}, out, ref_scale=rs_old)
    assert "1/1 seeds non-degenerate" in open(out).read()


def test_merge_write_accumulates_concurrent_sides(tmp_path):
    """Two studies sharing an out_dir (jax legs on TPU, torch halves on
    CPU) each rewrite results.json from their own in-memory dict;
    merge_write must fold the other side's on-disk legs in rather than
    clobber them, and the in-memory legs must win on conflict."""
    qs = _load("quality_study")
    p = str(tmp_path / "results.json")
    # torch-side process writes first
    qs.merge_write(p, {0: {"transformer": {"jax": {}, "torch": {"f": 2.0}}}})
    # jax-side process (knows nothing of the torch legs) writes later,
    # with a stale torch={} for the same component and a new seed
    qs.merge_write(p, {0: {"transformer": {"jax": {"f": 1.0}, "torch": {}}},
                       1: {"vqvae": {"jax": {"l": 0.5}, "torch": {}}}})
    with open(p) as f:
        got = json.load(f)
    assert got["0"]["transformer"] == {"jax": {"f": 1.0},
                                       "torch": {"f": 2.0}}
    assert got["1"]["vqvae"] == {"jax": {"l": 0.5}, "torch": {}}
    # re-run of a leg wins over the on-disk value
    qs.merge_write(p, {0: {"transformer": {"jax": {"f": 3.0}, "torch": {}}}})
    with open(p) as f:
        got = json.load(f)
    assert got["0"]["transformer"]["jax"] == {"f": 3.0}
    assert got["0"]["transformer"]["torch"] == {"f": 2.0}
    # a torn file on disk merges as empty instead of raising
    with open(p, "w") as f:
        f.write('{"0": {"transfo')
    qs.merge_write(p, {2: {"mlp_raw": {"jax": {"f": 0.1}, "torch": {}}}})
    with open(p) as f:
        got = json.load(f)
    assert got["2"]["mlp_raw"]["jax"] == {"f": 0.1}


def test_vq_pinning_is_per_seed_immutable(tmp_path):
    """The sentinel must pin a per-seed COPY of the VQ checkpoint, not
    the CLI's reused best-checkpoint path: a later seed's VQ leg
    overwrites that path's bytes, silently breaking the pairing of any
    split-side row whose two halves straddle it (round-4 bug)."""
    qs = _load("quality_study")
    out = str(tmp_path)
    best = tmp_path / "model_checkpoints" / "VQ-VAE-Patch-best.ckpt"
    best.parent.mkdir(parents=True)

    # seed 0 trains; the harness pins an immutable copy
    best.write_bytes(b"seed0-weights")
    pinned0 = qs.pin_vq(out, 0, str(best))
    assert qs.resolve_pinned_vq(out, 0) == pinned0

    # seed 1's VQ leg overwrites the CLI path — the pinned copy for
    # seed 0 must be unaffected
    best.write_bytes(b"seed1-weights")
    pinned1 = qs.pin_vq(out, 1, str(best))
    assert open(pinned0, "rb").read() == b"seed0-weights"
    assert open(pinned1, "rb").read() == b"seed1-weights"
    assert qs.vq_sha256(pinned0) != qs.vq_sha256(pinned1)

    # a LEGACY sentinel pointing at the mutable CLI path is rejected
    with open(os.path.join(out, "vq_ckpt_seed2.txt"), "w") as f:
        f.write(str(best))
    assert qs.resolve_pinned_vq(out, 2) is None

    # missing sentinel resolves to None
    assert qs.resolve_pinned_vq(out, 3) is None


def test_write_quality_md_renders_vq_pairing_audit(tmp_path):
    """Rows whose two sides carry vq_ckpt_sha256 render as hash-paired;
    differing hashes flag the row as invalid."""
    qs = _load("quality_study")
    res = {
        0: {"mlp_latent": {"jax": {"test/f1_score_mean": 0.8,
                                   "val/f1_score_mean": 0.8,
                                   "vq_ckpt_sha256": "aaa"},
                           "torch": {"test/f1_score_mean": 0.8,
                                     "val/f1_score_mean": 0.8,
                                     "vq_ckpt_sha256": "aaa"}}},
        1: {"mlp_latent": {"jax": {"test/f1_score_mean": 0.8,
                                   "val/f1_score_mean": 0.8,
                                   "vq_ckpt_sha256": "aaa"},
                           "torch": {"test/f1_score_mean": 0.8,
                                     "val/f1_score_mean": 0.8,
                                     "vq_ckpt_sha256": "bbb"}}},
    }
    out = str(tmp_path / "q.md")
    qs.write_quality_md(res, out)
    text = open(out).read()
    assert "VQ-pairing audit" in text
    assert "1 hash-paired, 1 mismatched" in text
    assert "MISMATCH" in text


def test_jax_leg_falls_back_to_cpu_after_default_backend_timeouts(
        monkeypatch):
    """Round-4 chain steps 3 and 5 died when 3 TPU-tunnel timeouts made
    _jax_leg raise, aborting the whole study queue. The hardened leg
    runner must instead run one final attempt on the CPU backend
    (JAX_PLATFORMS=cpu in the subprocess env) and record the fallback
    backend in the result row so tables can flag it (VERDICT r4 #3)."""
    qs = _load("quality_study")
    calls = []

    def fake_run(cmd, timeout_s, inactivity_s, cwd, env=None):
        calls.append(env)
        if env is None:
            return -9, "", ""  # default-backend attempt: stalled
        assert env.get("JAX_PLATFORMS") == "cpu"
        # the baked sitecustomize overrides JAX_PLATFORMS, so the leg
        # must ALSO carry the config-update force flag cli_leg honors
        assert env.get("CLILEG_FORCE_PLATFORM") == "cpu"
        assert timeout_s > 3600 and inactivity_s > 300
        return 0, 'CLILEG_RESULT {"val/loss": 1.5, "backend": "cpu"}\n', ""

    monkeypatch.setattr(qs, "_run_with_inactivity_kill", fake_run)
    # probe says the tunnel answers: all default-backend attempts run
    monkeypatch.setattr(qs, "_default_backend_answers", lambda: True)
    out = qs._jax_leg("recon", ["--seed", "0"], timeout_s=600, retries=2)
    assert out == {"val/loss": 1.5, "backend": "cpu"}
    # 3 default-backend attempts, then exactly one cpu-fallback attempt
    assert calls[:3] == [None, None, None] and len(calls) == 4

    # probe says the tunnel is stalled RIGHT NOW: skip the default-
    # backend attempts entirely (each would burn inactivity_s) and go
    # straight to the cpu fallback (round-5 hardening: the tunnel
    # flaps, and a stalled window costs ~15 min/leg without the probe)
    calls.clear()
    monkeypatch.setattr(qs, "_default_backend_answers", lambda: False)
    out = qs._jax_leg("recon", ["--seed", "0"], timeout_s=600, retries=2)
    assert out == {"val/loss": 1.5, "backend": "cpu"}
    assert len(calls) == 1 and calls[0] is not None
    monkeypatch.setattr(qs, "_default_backend_answers", lambda: True)

    # when the default backend succeeds, no backend key leaks into the
    # row (rows predating the fallback stay schema-identical)
    def fake_run_ok(cmd, timeout_s, inactivity_s, cwd, env=None):
        return 0, 'CLILEG_RESULT {"val/loss": 2.0, "backend": "tpu"}\n', ""

    monkeypatch.setattr(qs, "_run_with_inactivity_kill", fake_run_ok)
    assert qs._jax_leg("recon", [], retries=0) == {"val/loss": 2.0}


def test_merge_asserts_sha_pairing_per_seed(tmp_path):
    """Mismatched vq_ckpt_sha256 inside one seed means the halves were
    paired against different frozen VQ checkpoints — the exact round-4
    measurement-integrity bug. The merger must fail loudly instead of
    relying on manual discipline (ADVICE r4 #1); rows without hashes
    (predating sha recording) pass through."""
    import pytest
    m = _load("merge_quality_results")
    ok = _dump(tmp_path, "ok.json", {"0": {
        "vqvae": {"jax": {"vq_ckpt_sha256": "aaa"}, "torch": {}},
        "transformer": {"jax": {"vq_ckpt_sha256": "aaa"},
                        "torch": {"vq_ckpt_sha256": "aaa"}},
        "roundtrip": {"export_bit_equal": True}}})
    assert m.merge([ok])[0]["vqvae"]["jax"]["vq_ckpt_sha256"] == "aaa"

    bad = _dump(tmp_path, "bad.json", {"0": {
        "vqvae": {"jax": {"vq_ckpt_sha256": "aaa"}, "torch": {}},
        "transformer": {"jax": {"vq_ckpt_sha256": "aaa"},
                        "torch": {"vq_ckpt_sha256": "bbb"}}}})
    with pytest.raises(SystemExit, match="sha256 mismatch"):
        m.merge([bad])

    # producer-vs-consumer divergence is the legitimate restart shape
    # (a re-trained vqvae parity row while an earlier pin still feeds
    # downstream legs — round 5, TPU pin + CPU re-run): annotated, not
    # failed, as long as the CONSUMER halves agree with each other
    repin = _dump(tmp_path, "repin.json", {"0": {
        "vqvae": {"jax": {"vq_ckpt_sha256": "fresh"}, "torch": {}},
        "mlp_latent": {"jax": {"vq_ckpt_sha256": "pin"},
                       "torch": {"vq_ckpt_sha256": "pin"}}}})
    merged_repin = m.merge([repin])
    assert "retrained after the pin" in merged_repin[0]["_vq_sha_note"]

    # hash-free legacy rows are skipped, and _-prefixed provenance
    # notes pass through the merge untouched
    legacy = _dump(tmp_path, "legacy.json", {
        "0": {"transformer": {"jax": {"f": 1.0}, "torch": {}}},
        "_provenance": {"note": "kept"}})
    merged = m.merge([legacy])
    assert merged["_provenance"] == {"note": "kept"}
