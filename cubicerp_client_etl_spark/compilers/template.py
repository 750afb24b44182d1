"""Run-date parameter templating (SURVEY H4/H5).

The reference ``%``-templates SQL text, filenames and default-value
expressions with date variables derived from the job date
(``cubicerpetl/cubicerpetl.py:200-201,291,299,332,825`` — vars ``aaaa``
(4-digit year), ``mm``, ``dd``, ``aa`` (2-digit year)).

This engine renders templates *driver-side, on parameters only* — never
on row values (the reference's row-templated SQL is injection-by-design,
SURVEY §4.4.5; row-parametrized sinks use bind parameters instead).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Mapping


def date_localdict(run_date: _dt.date | _dt.datetime | str) -> dict[str, str]:
    """The reference's template vocabulary for a run date."""
    if isinstance(run_date, str):
        run_date = _dt.datetime.strptime(run_date[:10], "%Y-%m-%d").date()
    return {
        "aaaa": f"{run_date.year:04d}",
        "aa": f"{run_date.year % 100:02d}",
        "mm": f"{run_date.month:02d}",
        "dd": f"{run_date.day:02d}",
    }


def render_date_template(
    template: str,
    run_date: _dt.date | _dt.datetime | str,
    extra: Mapping[str, Any] | None = None,
) -> str:
    """Render ``%(aaaa)s/%(mm)s/...``-style templates with date vars.

    Also accepts ``{aaaa}``-style braces for specs written against this
    engine rather than the reference's ``%`` syntax.
    """
    localdict: dict[str, Any] = date_localdict(run_date)
    if extra:
        localdict.update(extra)
    if "%(" in template:
        return template % localdict
    out = template
    for k, v in localdict.items():
        out = out.replace("{" + k + "}", str(v))
    return out
