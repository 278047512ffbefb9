"""VOC AP golden tests, including the reference's hand fixture
(/root/reference/utils/utils.py:321-324) with analytically derived values."""

import numpy as np
import pytest

from yolo_v1_tpu.core.ap import voc_ap, voc_eval


def reference_fixture():
    preds = {
        "cat": [
            ["image01", 0.9, 20, 20, 40, 40],
            ["image01", 0.8, 20, 20, 50, 50],
            ["image02", 0.8, 30, 30, 50, 50],
        ],
        "dog": [["image01", 0.78, 60, 60, 90, 90]],
    }
    target = {
        ("image01", "cat"): [[20, 20, 41, 41]],
        ("image01", "dog"): [[60, 60, 91, 91]],
        ("image02", "cat"): [[30, 30, 51, 51]],
    }
    return preds, target


def test_voc_eval_reference_fixture():
    preds, target = reference_fixture()
    mAP, aps = voc_eval(preds, target, ["cat", "dog"])
    # Derived by hand: cat dets sorted 0.9,0.8,0.8 -> TP,FP,TP; npos=2;
    # rec=[.5,.5,1], prec=[1,.5,2/3]; continuous AP = .5*1 + .5*(2/3) = 5/6.
    # dog: single TP, AP = 1. mAP = (5/6 + 1)/2 = 11/12.
    np.testing.assert_allclose(aps["cat"], 5.0 / 6.0, rtol=1e-9)
    np.testing.assert_allclose(aps["dog"], 1.0, rtol=1e-9)
    np.testing.assert_allclose(mAP, 11.0 / 12.0, rtol=1e-9)


def test_voc_eval_does_not_mutate_inputs():
    preds, target = reference_fixture()
    before = {k: [list(b) for b in v] for k, v in target.items()}
    voc_eval(preds, target, ["cat", "dog"])
    assert target == before  # reference pops GT in place; we must not


def test_voc_eval_greedy_no_rematch():
    # Two detections matching the same single GT box: only the higher-scored
    # one is a TP (reference removal, utils/utils.py:296-298).
    preds = {"cat": [["im", 0.9, 0, 0, 10, 10], ["im", 0.8, 0, 0, 10, 10]]}
    target = {("im", "cat"): [[0, 0, 10, 10]]}
    mAP, aps = voc_eval(preds, target, ["cat"])
    # tp=[1,0] fp=[0,1], npos=1 -> rec=[1,1], prec=[1,.5] -> AP=1.
    np.testing.assert_allclose(aps["cat"], 1.0)


def test_zero_pred_policy_fixed_continues():
    preds = {"dog": [["im", 0.9, 0, 0, 10, 10]]}
    target = {("im", "dog"): [[0, 0, 10, 10]], ("im", "cat"): [[5, 5, 8, 8]]}
    mAP, aps = voc_eval(preds, target, ["cat", "dog"])
    assert aps["cat"] == 0.0
    np.testing.assert_allclose(aps["dog"], 1.0)
    np.testing.assert_allclose(mAP, 0.5)


def test_zero_pred_policy_reference_break():
    # Reproduces the reference quirk (utils/utils.py:248-255): ap=-1 and the
    # remaining classes are dropped from the mean.
    preds = {"dog": [["im", 0.9, 0, 0, 10, 10]]}
    target = {("im", "dog"): [[0, 0, 10, 10]]}
    mAP, aps = voc_eval(
        preds, target, ["cat", "dog"], zero_pred_policy="reference_break"
    )
    assert aps == {"cat": -1.0}
    np.testing.assert_allclose(mAP, -1.0)


def test_voc_ap_11_point():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 0.5])
    # 11-pt: t in 0..1 step .1 -> p = 1.0 for t<=0.5 (6 pts), 0.5 above (5).
    want = (6 * 1.0 + 5 * 0.5) / 11.0
    np.testing.assert_allclose(voc_ap(rec, prec, use_07_metric=True), want)


def test_voc_ap_monotone_envelope():
    rec = np.array([0.2, 0.4, 0.4, 0.8])
    prec = np.array([1.0, 0.5, 0.75, 0.6])
    # Continuous AP integrates the precision envelope over recall steps:
    # envelope at recall .2 -> 1.0; .4 -> .75; .8 -> .6.
    want = 0.2 * 1.0 + 0.2 * 0.75 + 0.4 * 0.6
    np.testing.assert_allclose(voc_ap(rec, prec), want)
