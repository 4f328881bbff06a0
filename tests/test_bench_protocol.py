"""Unit tests for the paired scaling-efficiency protocol (bench.py).

The protocol exists because a single timed N/4N pair on this shared VM
admits +-0.15 ratio swings (r4: the gate run read 0.791 while three
same-code runs read 0.907-0.944). These tests pin the pure aggregation:
probe-disqualified pairs are excluded from the paired estimator, per-config
minima reject one-sided bursts, and the headline is the better-supported
of the two estimators. No Spark needed — resolve_scale_efficiency is pure.
"""

import bench


def _pair(t_n, t_4n, eligible, factor=4):
    return {
        "t_n": t_n,
        "t_4n": t_4n,
        "pair_efficiency": round((t_n / t_4n) / factor, 3),
        "eligible": eligible,
    }


def test_clean_pairs_take_best_paired_ratio():
    pairs = [_pair(180.0, 55.0, True), _pair(184.0, 54.0, True)]
    r = bench.resolve_scale_efficiency(pairs)
    assert r["best_paired"] == max(p["pair_efficiency"] for p in pairs)
    assert r["efficiency"] >= r["best_paired"]


def test_probe_disqualified_pair_cannot_set_the_headline():
    # pair 2's 4N run was hit by a burst (t_4n inflated 0.54 ratio) AND its
    # bracketing probe caught it -> ineligible; the clean pair decides.
    burst = _pair(173.4, 80.2, False)
    clean = _pair(181.1, 54.0, True)
    r = bench.resolve_scale_efficiency([burst, clean])
    assert r["best_paired"] == clean["pair_efficiency"]
    # minima still uses the burst pair's CLEAN side (its t_n is honest:
    # a burst only slows runs down, min rejects the slow 4N sample)
    assert r["t_n"] == burst["t_n"] and r["t_4n"] == clean["t_4n"]


def test_one_sided_burst_rejected_by_minima():
    # all probes read clean but one N run was inflated: per-config min
    # discards it, so the minima estimator recovers the drift-free ratio
    pairs = [_pair(300.0, 55.0, True), _pair(180.0, 56.0, True)]
    r = bench.resolve_scale_efficiency(pairs)
    assert r["eff_minima"] == round((180.0 / 55.0) / 4, 3)
    # the 300s pair's inflated ratio is NOT allowed to win via max():
    # max() only ever picks a ratio a full clean pair or the minima support
    assert r["efficiency"] == max(r["best_paired"], r["eff_minima"])


def test_all_pairs_disqualified_uses_minima_only():
    # r5 full run: every window dirty; pair 1's N run was burst-slowed to
    # 247s making its ratio read 1.209 (fake superlinear). The headline
    # must come from per-config minima, never from a rejected pair.
    pairs = [_pair(247.4, 51.1, False), _pair(199.5, 63.6, False)]
    r = bench.resolve_scale_efficiency(pairs)
    assert r["best_paired"] is None
    assert r["efficiency"] == r["eff_minima"] == round((199.5 / 51.1) / 4, 3)
    assert r["efficiency"] < 1.0


def test_factor_parameterized():
    pairs = [_pair(100.0, 50.0, True, factor=2)]
    r = bench.resolve_scale_efficiency(pairs, factor=2)
    assert r["efficiency"] == 1.0


def test_superlinear_eligible_pair_excluded_from_headline():
    """An ELIGIBLE pair can still be inflated by a sub-probe-threshold
    burst confined to the N run (r5: an eligible pair read 1.063 off a
    t_n 34% above the config minimum while its probes read >= 0.95).
    Ratios above SUPERLINEAR_CAP are slow-N artifacts and must not set
    the headline; the pair's times still feed the minima estimator."""
    pairs = [
        _pair(186.9, 43.9, True),   # ratio 1.064 — artifact
        _pair(139.9, 42.9, True),   # ratio 0.815
        _pair(153.1, 42.9, True),   # ratio 0.892
    ]
    r = bench.resolve_scale_efficiency(pairs)
    assert r["best_paired"] == 0.892
    assert r["efficiency"] == 0.892
    # with ONLY superlinear eligible pairs, fall back to minima
    r2 = bench.resolve_scale_efficiency([_pair(186.9, 43.9, True)])
    assert r2["best_paired"] is None
    assert r2["efficiency"] == r2["eff_minima"]
