#!/usr/bin/env python
"""One-shot comment hygiene (judge r12 item 7): header block comments
that cite a query's BIRTH number where the live registry number now
differs (e.g. "# q009 — Winnowing" when winnowing lives at q259).

For every ``@register("qNNN_suffix", ...)`` call, scan upward through
the immediately preceding comment block for a ``# qMMM — `` (or
``# qMMM (birth qKKK) — ``) header line. If the cited number disagrees
with the live registry number, rewrite it to the repo's existing
convention ``# qNNN (birth qMMM) — `` so the header leads with the
live name while preserving the birth number the suffix-based rename
history is keyed on. Idempotent; prints every rewrite for audit.
"""

from __future__ import annotations

import pathlib
import re

ROOT = pathlib.Path(__file__).resolve().parent.parent
REG = re.compile(r'@register\(\s*\n?\s*"(q\d{3})_')
HEADER = re.compile(r"^(#\s*)(q\d{2,3})(\s*(?:\(birth (q\d{2,3})\))?\s*—)")


def fix_file(path: pathlib.Path) -> int:
    lines = path.read_text().splitlines(keepends=True)
    text = "".join(lines)
    n_fixed = 0
    # line index of each @register call's opening line
    for m in REG.finditer(text):
        live = m.group(1)
        reg_line = text.count("\n", 0, m.start())
        # walk upward through the contiguous comment block (allow the
        # decorator itself and separator lines like # ------)
        i = reg_line - 1
        for _ in range(40):  # bounded upward walk
            if i < 0:
                break
            stripped = lines[i].strip()
            h = HEADER.match(stripped)
            if h:
                cited = h.group(2)
                birth = h.group(4)
                if cited != live:
                    new_birth = birth or cited
                    repl = f"{h.group(1)}{live} (birth {new_birth}) —"
                    lines[i] = lines[i].replace(
                        stripped[: h.end(3)], repl, 1
                    )
                    print(f"{path}:{i + 1}: {cited} -> {live} (birth {new_birth})")
                    n_fixed += 1
                break
            # hop over blanks, other comment lines, and module-level
            # helper constants that may sit between the header block and
            # the @register (e.g. _WINNOW_K = 8); stop at anything else
            if (
                stripped == ""
                or stripped.startswith("#")
                or re.match(r"^[_A-Za-z][_A-Za-z0-9]*\s*=", stripped)
                or stripped in (")", "]", "}")
            ):
                i -= 1
                continue
            break
    if n_fixed:
        path.write_text("".join(lines))
    return n_fixed


def main() -> None:
    total = 0
    for path in sorted(ROOT.glob("cubicerp_client_etl_spark/**/*.py")):
        total += fix_file(path)
    print(f"{total} headers fixed")


if __name__ == "__main__":
    main()
