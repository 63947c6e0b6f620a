"""Pin the sq8 serving-row normalization clip (r12 judge finding #1).

The sq8 serving rows are job-floor-bound: recorded calibration pairs
show their QPS moves only ~7-8% across a 2.4× paired-GEMM window swing,
so a LINEAR GEMM multiplier applied to a throttled window overstates —
r12's driver capture published sq8_262k_n = 881,211 (raw 212,681 ×
232.11/56) in a window whose same-round clean-capture truth was
298,138.  ``bench.sq8_normalized`` must clip the multiplier to the
calibrated sensitivity and flag out-of-regime captures.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SQ8_NORM_CLIP, SQ8_SUSPECT_RATIO, sq8_normalized

REF_GFLOPS = 232.11

# (raw qps, paired gflops, clean-window truth) — committed captures:
# r12 driver throttled window vs the r12 official clean capture
R12_THROTTLED = (212_681.0, 56.0, 298_138.0)
# r8 calibration pair the floor-bound claim is measured from:
# 120.3k @ 179 GFLOPS vs 129.4k @ 428 GFLOPS (~7% across 2.4×)
R8_SLOW = (120_300.0, 179.0, 129_400.0)


def test_throttled_window_never_exceeds_clean_truth():
    # replaying the r12 throttled capture must yield a value at or
    # below the clean-window measurement (the judge's done-criterion)
    qps_n, suspect = sq8_normalized(*R12_THROTTLED[:2], REF_GFLOPS)
    assert qps_n <= R12_THROTTLED[2]
    # and the 4.1× paired-GEMM ratio is outside the calibrated regime
    assert suspect


def test_calibrated_pair_stays_within_sensitivity():
    qps_n, suspect = sq8_normalized(*R8_SLOW[:2], REF_GFLOPS)
    # the rescue multiplier is bounded by the calibrated sensitivity…
    assert qps_n <= R8_SLOW[0] * SQ8_NORM_CLIP + 1e-6
    # …and lands within ~10% of the fast-window truth
    assert abs(qps_n - R8_SLOW[2]) / R8_SLOW[2] < 0.10
    assert not suspect  # 232.11/179 = 1.3× is inside the regime


def test_fast_window_stands_on_raw():
    # paired GEMM faster than the anchor: multiplier floors at 1
    qps_n, suspect = sq8_normalized(300_000.0, 500.0, REF_GFLOPS)
    assert qps_n == 300_000.0
    assert not suspect


def test_suspect_threshold_is_the_regime_boundary():
    ratio_edge = REF_GFLOPS / SQ8_SUSPECT_RATIO
    _, just_inside = sq8_normalized(1.0, ratio_edge * 1.01, REF_GFLOPS)
    _, outside = sq8_normalized(1.0, ratio_edge * 0.99, REF_GFLOPS)
    assert not just_inside
    assert outside
