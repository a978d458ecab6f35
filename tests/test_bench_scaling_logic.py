"""scaling_pair's interference defenses, unit-tested with fake legs.

The pair's correctness depends on machinery wall-clock can't verify on a
noisy host: two unconditional interleaved passes, best-per-level by
steal-corrected wall, and retries on visible steal (>2% pessimistic
bound) or >10% wall dispersion (the bandwidth-contention case steal
can't see).  Fake leg results pin each decision.
"""
import bench


def _fake_leg_factory(script):
    """script: {cpus: [result, ...]} consumed in call order."""
    calls = {"count": 0, "per_level": {}}

    def fake(cmd, env, timeout=3600):
        cpus = int(cmd[cmd.index("--cpus") + 1])
        idx = calls["per_level"].get(cpus, 0)
        calls["per_level"][cpus] = idx + 1
        calls["count"] += 1
        wall, steal = script[cpus][min(idx, len(script[cpus]) - 1)]
        corrected = max(wall - bench.steal_wall_share(steal), 0.001)
        return {
            "value": wall,
            "steal_cpu_sec": steal,
            "value_steal_corrected": round(corrected, 3),
            "triples_per_sec": round(1000.0 / wall, 2),
            "triples_per_sec_corrected": round(1000.0 / corrected, 2),
        }

    return fake, calls


def test_quiet_pair_runs_two_passes_no_retry(monkeypatch):
    fake, calls = _fake_leg_factory({
        8: [(240.0, 0.5), (241.0, 0.4)],
        32: [(72.0, 0.3), (72.5, 0.6)],
    })
    monkeypatch.setattr(bench, "run_leg_subprocess", fake)
    s = bench.scaling_pair("/tmp/sf", convs=100)
    assert calls["per_level"] == {8: 2, 32: 2}  # no retries
    assert s["low_sec"] == 240.0 and s["high_sec"] == 72.0
    assert s["efficiency"] == round((240.0 / 72.0) / 4, 3)


def test_visible_steal_triggers_retry_and_best_kept(monkeypatch):
    # high leg dirty in both passes (steal 4.7% of pessimistic bound was
    # the observed miss at the old 5% threshold) -> retried, clean third
    # sample wins
    fake, calls = _fake_leg_factory({
        8: [(240.0, 0.5), (240.5, 0.2)],
        32: [(90.0, 136.0), (91.0, 140.0), (72.0, 0.5)],
    })
    monkeypatch.setattr(bench, "run_leg_subprocess", fake)
    s = bench.scaling_pair("/tmp/sf", convs=100)
    assert calls["per_level"][32] == 3  # steal retry fired
    assert s["high_sec"] == 72.0       # clean sample kept
    assert s["high_steal_cpu_sec"] == 0.5


def test_invisible_dispersion_triggers_retry(monkeypatch):
    # no visible steal at all, but the two wide-leg walls differ 24%
    # (the memory-bandwidth signature): a third sample must run
    fake, calls = _fake_leg_factory({
        8: [(240.0, 0.1), (240.2, 0.1)],
        32: [(90.0, 0.2), (72.5, 0.1), (72.0, 0.1)],
    })
    monkeypatch.setattr(bench, "run_leg_subprocess", fake)
    s = bench.scaling_pair("/tmp/sf", convs=100)
    assert calls["per_level"][32] == 3
    assert s["high_sec"] == 72.0


def test_pair_embeds_window_quality(monkeypatch):
    fake, calls = _fake_leg_factory({
        8: [(240.0, 0.5), (241.0, 0.4)],
        32: [(90.0, 136.0), (91.0, 140.0), (72.0, 0.5)],
    })
    monkeypatch.setattr(bench, "run_leg_subprocess", fake)
    s = bench.scaling_pair("/tmp/sf", convs=100)
    hq = s["high_window_quality"]
    assert hq["kept_sample"] == 2          # the clean third leg
    assert hq["quiet"] is True             # 0.5 / (32*72) ~ 0.02%
    assert hq["reproduced"] is False       # 72 vs 90: best-two gap 25%
    assert [x["wall"] for x in hq["samples"]] == [90.0, 91.0, 72.0]
    lq = s["low_window_quality"]
    assert lq["quiet"] and lq["reproduced"] and lq["kept_sample"] == 0


# ---------------------------------------------------------------------------
# pure sample-quality helpers (the headline hunt reuses them)
# ---------------------------------------------------------------------------


def test_best2_dispersion_recovers_with_clean_samples():
    assert bench.best2_dispersion([100.0]) == 0.0
    assert round(bench.best2_dispersion([90.0, 72.5]), 3) == 0.241
    # a third clean sample pairs with the earlier clean one: reproduced
    assert round(bench.best2_dispersion([90.0, 72.5, 72.0]), 3) == 0.007


def test_keep_sample_prefers_steal_corrected_minimum():
    import os
    nc = os.cpu_count() or 1
    # plain raw minimum when steal is negligible
    assert bench.keep_sample([(72.0, 0.5), (71.0, 0.4)]) == 1
    # a slower wall wins once its measured steal correction exceeds the
    # gap (same criterion the scaling legs apply via
    # value_steal_corrected)
    assert bench.keep_sample([(72.0, 0.0), (73.0, 2.0 * nc)]) == 1
    assert bench.keep_sample([(72.0, 0.0), (73.0, 0.5 * nc)]) == 0


def test_needs_more_samples_bounds():
    cpus = 32
    # below min: always more
    assert bench.needs_more_samples([], cpus)
    assert bench.needs_more_samples([(72.0, 0.1)], cpus)
    # quiet + reproduced after two: stop
    assert not bench.needs_more_samples([(72.0, 0.1), (72.5, 0.1)], cpus)
    # dirty kept sample: one more (until the cap)
    dirty = [(72.0, 200.0), (72.5, 210.0)]
    assert bench.needs_more_samples(dirty, cpus)
    assert not bench.needs_more_samples(dirty + [(73.0, 205.0)], cpus,
                                        max_samples=3)
