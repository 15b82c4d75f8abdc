"""Chart rendering from a PlotDecision — parity with the reference's
matplotlib step (``/root/reference/app-gradio.py:230-252``).

Split in two layers so the logic is testable in any environment:

- :func:`prepare_chart_data` — pure: applies the reference's rules
  (first-two-columns fallback for wide results, numeric coercion for pie
  values, not-plottable / unknown-chart-type short-circuits) and returns a
  :class:`ChartSpec` or ``None``.
- :func:`render_chart` — draws the spec with matplotlib (Agg backend,
  headless) when the library is importable; returns ``None`` otherwise.
  The sandbox ships no matplotlib, so this path is import-gated exactly
  like the reference's optional dependencies; the drawing calls mirror
  app-gradio.py: ``ax.bar`` + 45° right-anchored tick rotation for bar,
  ``ax.pie`` with ``autopct='%1.1f%%'`` for pie, ``tight_layout`` both.

Chart failure is non-fatal end to end (the reference logs and continues
with ``plot_figure = None``) — :func:`render_answer_chart` never raises.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .chain import Answer, PlotDecision

try:  # pragma: no cover — exercised only where matplotlib exists
    import matplotlib

    matplotlib.use("Agg")  # headless
    from matplotlib import pyplot as plt

    HAVE_MATPLOTLIB = True
except ImportError:  # pragma: no cover
    HAVE_MATPLOTLIB = False

CHART_TYPES = ("bar", "pie")


@dataclass
class ChartSpec:
    chart_type: str
    title: str
    x_label: str
    y_label: str
    categories: list = field(default_factory=list)
    values: list = field(default_factory=list)


def prepare_chart_data(
    decision: PlotDecision, columns: list[str], rows: list[tuple]
) -> ChartSpec | None:
    """Reference chart-prep semantics (app-gradio.py:230-245):

    - not plottable / unsupported chart type / empty result → None;
    - wide results use the FIRST TWO columns (category, value) — the
      reference's explicit >2-column fallback;
    - pie values must coerce to numbers (``pd.to_numeric`` in the
      reference; failure aborts the chart, not the answer).
    """
    if not decision.plottable or decision.chart_type not in CHART_TYPES or not rows:
        return None
    if not rows[0] or len(rows[0]) < 2:
        return None  # single-column results are not chartable
    categories = [r[0] for r in rows]
    values = list(r[1] for r in rows)
    if decision.chart_type == "pie":
        try:
            values = [float(v) for v in values]
        except (TypeError, ValueError):
            return None
    x_label = decision.x_label or (columns[0] if columns else "Category")
    y_label = decision.y_label or (columns[1] if len(columns) > 1 else "Value")
    return ChartSpec(
        chart_type=decision.chart_type,
        title=decision.title,
        x_label=x_label,
        y_label=y_label,
        categories=categories,
        values=values,
    )


def render_chart(spec: ChartSpec):  # -> matplotlib Figure | None
    """Draw the spec (app-gradio.py:233-250 parity); None without matplotlib."""
    if not HAVE_MATPLOTLIB:
        return None
    fig, ax = plt.subplots()
    if spec.chart_type == "bar":
        ax.bar([str(c) for c in spec.categories], spec.values)
        ax.set_xlabel(spec.x_label)
        ax.set_ylabel(spec.y_label)
        ax.set_title(spec.title)
        plt.setp(ax.get_xticklabels(), rotation=45, ha="right", rotation_mode="anchor")
    else:  # pie
        ax.pie(spec.values, labels=[str(c) for c in spec.categories], autopct="%1.1f%%")
        ax.set_title(spec.title)
    fig.tight_layout()
    plt.close(fig)  # reference: close to keep it out of interactive display
    return fig


def render_answer_chart(answer: Answer):  # -> matplotlib Figure | None
    """The presentation edge: Answer → optional Figure; never raises."""
    try:
        spec = prepare_chart_data(answer.plot, answer.columns, answer.rows)
        return render_chart(spec) if spec else None
    except Exception:  # noqa: BLE001 — chart failure is non-fatal (reference parity)
        return None
