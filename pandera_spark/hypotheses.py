"""Hypothesis tests: statistical checks executed via Spark aggregates.

Reference: /root/reference/pandera/api/hypotheses.py:15-180 (Hypothesis,
RELATIONSHIPS :18), two_sample_ttest :182-290, one_sample_ttest :293-381;
relationship evaluators backends/pandas/hypotheses.py:17-34; sample splitting
:78-140.  The reference only wires these into the pandas backend — our engine
runs them natively on Spark (SURVEY.md §2.E):

- one-sample t-test: count/mean/stddev fold into the SAME single aggregation
  pass as all other checks (zero extra jobs);
- two-sample t-test: one ``groupBy(groupby_col)`` job computing
  count/mean/variance per group, closed-form Student or Welch t on the
  driver.

The t survival function uses the regularized incomplete beta continued
fraction (Lentz's algorithm — standard numerical method, public), so no scipy
dependency; results match ``scipy.stats.ttest_ind`` to ~1e-12.
"""

from __future__ import annotations

import math
from typing import Any, Optional

from .checks import Check
from .engine import NUMERIC_TYPES

# relationship -> decision from (stat, pvalue, alpha)
# (reference backends/pandas/hypotheses.py:17-34)
RELATIONSHIPS = {
    "greater_than": lambda stat, p, alpha: stat > 0 and p / 2 < alpha,
    "less_than": lambda stat, p, alpha: stat < 0 and p / 2 < alpha,
    "not_equal": lambda stat, p, alpha: p < alpha,
    "equal": lambda stat, p, alpha: p >= alpha,
}


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta function (Lentz)."""
    MAXIT, EPS, FPMIN = 200, 3.0e-12, 1.0e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < EPS:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def student_t_two_sided_p(t: float, df: float) -> float:
    """Two-sided p-value for Student's t (matches scipy.ttest_* convention)."""
    if df <= 0:
        return float("nan")
    x = df / (df + t * t)
    return betainc_reg(df / 2.0, 0.5, x)


def welch_df(var1: float, n1: int, var2: float, n2: int) -> float:
    num = (var1 / n1 + var2 / n2) ** 2
    den = (var1 / n1) ** 2 / (n1 - 1) + (var2 / n2) ** 2 / (n2 - 1)
    return num / den if den > 0 else float(n1 + n2 - 2)


def two_sample_t(
    n1: int, mean1: float, var1: float,
    n2: int, mean2: float, var2: float,
    equal_var: bool = True,
) -> tuple[float, float]:
    """(t statistic, two-sided p) — Student (pooled) or Welch."""
    if n1 < 2 or n2 < 2:
        return float("nan"), float("nan")
    if equal_var:
        df = n1 + n2 - 2
        sp2 = ((n1 - 1) * var1 + (n2 - 1) * var2) / df
        se = math.sqrt(sp2 * (1.0 / n1 + 1.0 / n2))
    else:
        df = welch_df(var1, n1, var2, n2)
        se = math.sqrt(var1 / n1 + var2 / n2)
    if se == 0:
        return float("nan"), float("nan")
    t = (mean1 - mean2) / se
    return t, student_t_two_sided_p(t, df)


def one_sample_t(n: int, mean: float, std: float, popmean: float
                 ) -> tuple[float, float]:
    if n < 2 or std == 0:
        return float("nan"), float("nan")
    t = (mean - popmean) / (std / math.sqrt(n))
    return t, student_t_two_sided_p(t, n - 1)


class Hypothesis(Check):
    """Statistical check (subclass of Check, reference api/hypotheses.py:15).

    Custom hypotheses: pass ``test`` (callable on collected group samples)
    and ``relationship`` (callable on its result) — executed via a bounded
    ``collect_list`` per group (opt-in, driver-side).
    """

    def __init__(
        self,
        test=None,
        samples: Optional[list] = None,
        groupby: Optional[str] = None,
        relationship: str | Any = "equal",
        alpha: float = 0.01,
        test_kwargs: Optional[dict] = None,
        relationship_kwargs: Optional[dict] = None,
        *,
        name: str = "hypothesis",
        error: Optional[str] = None,
        agg_kind: Optional[str] = "hypothesis_custom",
        raise_warning: bool = False,
        distributed: bool = False,
        max_collect_rows: int = 500_000,
        **kwargs,
    ):
        if isinstance(relationship, str) and relationship not in RELATIONSHIPS:
            raise ValueError(
                f"relationship must be one of {set(RELATIONSHIPS)}, "
                f"got {relationship!r}"
            )
        super().__init__(
            None,
            name=name,
            error=error or name,
            agg_kind=agg_kind,
            accepted_dtypes=NUMERIC_TYPES,
            raise_warning=raise_warning,
            distributed=distributed,
            statistics=kwargs.pop("statistics", {}),
        )
        self.test = test
        self.samples = samples or []
        self.groupby = groupby
        # driver-OOM guard for the collect lane: a custom hypothesis on
        # a big column must opt into distributed=True (applyInPandas on
        # one executor) or raise a bigger explicit bound; <=0 disables
        self.max_collect_rows = int(max_collect_rows)
        self.relationship = relationship
        self.alpha = alpha
        self.test_kwargs = test_kwargs or {}
        self.relationship_kwargs = relationship_kwargs or {}

    def decide(self, stat: float, pvalue: float) -> bool:
        if callable(self.relationship):
            return bool(
                self.relationship(stat, pvalue, **self.relationship_kwargs)
            )
        if math.isnan(stat) or math.isnan(pvalue):
            return False
        return RELATIONSHIPS[self.relationship](stat, pvalue, self.alpha)

    # reference api/hypotheses.py:182-290
    @classmethod
    def two_sample_ttest(
        cls,
        sample1: Any,
        sample2: Any,
        groupby: str,
        relationship: str = "equal",
        alpha: float = 0.01,
        equal_var: bool = True,
        **kwargs,
    ) -> "Hypothesis":
        h = cls(
            samples=[sample1, sample2],
            groupby=groupby,
            relationship=relationship,
            alpha=alpha,
            name="two_sample_ttest",
            error=kwargs.pop("error", None)
            or f"two_sample_ttest({sample1!r}, {sample2!r})",
            agg_kind="hypothesis_two_sample",
            **kwargs,
        )
        h.equal_var = equal_var
        h.statistics = {
            "sample1": sample1, "sample2": sample2, "groupby": groupby,
            "relationship": relationship, "alpha": alpha,
            "equal_var": equal_var,
        }
        return h

    # reference api/hypotheses.py:293-381
    @classmethod
    def one_sample_ttest(
        cls,
        popmean: float,
        relationship: str = "equal",
        alpha: float = 0.01,
        **kwargs,
    ) -> "Hypothesis":
        h = cls(
            relationship=relationship,
            alpha=alpha,
            name="one_sample_ttest",
            error=kwargs.pop("error", None)
            or f"one_sample_ttest({popmean!r})",
            agg_kind="hypothesis_one_sample",
            **kwargs,
        )
        h.popmean = popmean
        h.statistics = {
            "popmean": popmean, "relationship": relationship, "alpha": alpha,
        }
        return h

    # beyond-reference (SURVEY §2.E extension): independence between
    # this column and another categorical column, same Hypothesis
    # surface as the t-tests; computed by operators/stats.py's
    # chi2_independence (one contingency aggregation, closed-form p)
    @classmethod
    def chi2_independence(
        cls,
        other_col: str,
        relationship: str = "equal",
        alpha: float = 0.01,
        **kwargs,
    ) -> "Hypothesis":
        """Chi-square test of independence between this column and
        ``other_col`` (both treated as categorical).

        ``relationship="equal"`` asserts the columns ARE independent
        (passes while the null hypothesis survives: p >= alpha);
        ``relationship="not_equal"`` asserts dependence (p < alpha).
        Sided relationships are rejected — the statistic has no sign.
        """
        if relationship not in ("equal", "not_equal"):
            raise ValueError(
                "chi2_independence supports relationship 'equal' or "
                f"'not_equal', got {relationship!r}"
            )
        h = cls(
            relationship=relationship,
            alpha=alpha,
            name="chi2_independence",
            error=kwargs.pop("error", None)
            or f"chi2_independence(vs {other_col!r})",
            agg_kind="hypothesis_chi2_indep",
            **kwargs,
        )
        # categorical test: lift the numeric gating the t-tests need
        h.accepted_dtypes = None
        h.other_col = other_col
        h.statistics = {
            "other_col": other_col, "relationship": relationship,
            "alpha": alpha,
        }
        return h


