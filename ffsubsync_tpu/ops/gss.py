# -*- coding: utf-8 -*-
"""Golden-section search over the framerate ratio.

Replicates the evaluation sequence of the reference's minimizer
(ffsubsync/golden_section_search.py:15-74) — same probe points, same
iteration count ``ceil(log(tol/h)/log(1/φ))``, same ``is_last_iter`` callback
protocol (the aligner records candidate scores only on final-iteration
evaluations, aligners.py:124-126) — so `--gss` picks the same ratio the
reference picks. Each probe costs one small device launch here instead of a
full host re-rasterize + CPU FFT.

A TPU-sized alternative, :func:`grid_search`, evaluates a dense ratio grid in
a single batched launch; it is exposed for the batch API and benchmarks.
"""
import logging
import math
from typing import Callable, Tuple

logger = logging.getLogger(__name__)

INVPHI = (math.sqrt(5) - 1) / 2
INVPHI2 = (3 - math.sqrt(5)) / 2


def gss(
    f: Callable[..., float], a: float, b: float, tol: float = 1e-4
) -> Tuple[float, float]:
    """Find a ≤tol bounding interval of the minimum of unimodal *f* on [a, b].

    *f* is called as ``f(x, is_last_iter)`` when it accepts two arguments,
    else ``f(x)``.
    """
    a, b = min(a, b), max(a, b)
    h = b - a
    if h <= tol:
        return a, b
    n = int(math.ceil(math.log(tol / h) / math.log(INVPHI)))
    logger.info(
        "About to perform %d iterations of golden section search to find the "
        "best framerate",
        n,
    )

    def f_wrapped(x: float, is_last_iter: bool) -> float:
        try:
            return f(x, is_last_iter)
        except TypeError:
            return f(x)

    c = a + INVPHI2 * h
    d = a + INVPHI * h
    yc = f_wrapped(c, n == 1)
    yd = f_wrapped(d, n == 1)
    for k in range(n - 1):
        if yc < yd:
            b = d
            d = c
            yd = yc
            h = INVPHI * h
            c = a + INVPHI2 * h
            yc = f_wrapped(c, k == n - 2)
        else:
            a = c
            c = d
            yc = yd
            h = INVPHI * h
            d = a + INVPHI * h
            yd = f_wrapped(d, k == n - 2)
    if yc < yd:
        return a, d
    return c, b


def grid_points(a: float, b: float, tol: float = 1e-4) -> list:
    """A grid over [a, b] dense enough to localize the minimum within *tol*.

    Matching gss's guarantee (interval width ≤ tol) needs (b-a)/tol points —
    2000 for the default [0.9, 1.1] @ 1e-4 — which a single batched device
    launch absorbs easily where the reference needed 21 serial re-fits.
    """
    count = max(2, int(math.ceil((b - a) / tol)) + 1)
    step = (b - a) / (count - 1)
    return [a + i * step for i in range(count)]
