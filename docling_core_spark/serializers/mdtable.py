"""GitHub-flavored markdown table rendering.

A from-scratch, dependency-free re-implementation of the subset of the
public ``tabulate`` package behavior that the reference relies on
(``tabulate(rows, headers, tablefmt="github")``, used by
serializer/markdown.py:325-335). Semantics replicated:

* column type inference over data cells: int if every cell parses as
  int, else float if every cell parses as float, else str
* numeric parsing ("numparse"): ints rendered via ``format(int(x), '')``,
  floats via ``format(float(x), 'g')`` (tabulate's default floatfmt)
* alignment: string columns left-aligned, numeric columns decimal-
  aligned then right-justified; headers follow column alignment
* github layout: ``| cell | cell |`` with single-space padding and a
  ``|---|`` separator line (no alignment colons)
"""

from __future__ import annotations

from typing import List, Optional, Sequence


def _parse_int(s: str) -> Optional[int]:
    try:
        return int(s)
    except (ValueError, TypeError):
        return None


def _parse_float(s: str) -> Optional[float]:
    try:
        return float(s)
    except (ValueError, TypeError):
        return None


def _column_type(cells: Sequence[str], numparse: bool) -> str:
    if not numparse or not cells:
        return "str"
    if all(_parse_int(c) is not None for c in cells):
        return "int"
    if all(_parse_float(c) is not None for c in cells):
        return "float"
    return "str"


def _format_cell(s: str, ctype: str) -> str:
    if ctype == "int":
        v = _parse_int(s)
        return format(v, "") if v is not None else s
    if ctype == "float":
        v = _parse_float(s)
        return format(v, "g") if v is not None else s
    return s


def _decimal_align(cells: List[str]) -> List[str]:
    """Pad right so decimal points line up (tabulate 'decimal' align)."""
    def after_point(c: str) -> int:
        i = c.rfind(".")
        return len(c) - i - 1 if i >= 0 else -1

    afters = [after_point(c) for c in cells]
    max_after = max((a for a in afters if a >= 0), default=-1)
    if max_after < 0:
        return cells
    out = []
    for c, a in zip(cells, afters):
        pad = max_after - a if a >= 0 else max_after + 1
        out.append(c + " " * max(pad, 0))
    return out


def render_github_table(data_rows: Sequence[Sequence[str]],
                        headers: Sequence[str],
                        numparse: bool = True) -> str:
    """Render rows + headers as a github-format markdown table."""
    ncols = max([len(headers)] + [len(r) for r in data_rows]) if (
        headers or data_rows) else 0
    if ncols == 0:
        return ""
    heads = [str(h) for h in headers] + [""] * (ncols - len(headers))
    rows = [[str(c) for c in r] + [""] * (ncols - len(r)) for r in data_rows]

    col_texts: List[List[str]] = []
    aligns: List[str] = []
    for j in range(ncols):
        cells = [r[j] for r in rows]
        ctype = _column_type(cells, numparse)
        formatted = [_format_cell(c, ctype) for c in cells]
        if ctype in ("int", "float"):
            formatted = _decimal_align(formatted)
            aligns.append("right")
        else:
            aligns.append("left")
        col_texts.append(formatted)

    # tabulate pads every column to at least header width + MIN_PADDING
    # (tabulate.MIN_PADDING = 2, applied whenever headers are passed -
    # including empty-string headers)
    widths = [
        max([len(heads[j]) + 2] + [len(c) for c in col_texts[j]])
        for j in range(ncols)
    ]

    def pad(s: str, j: int) -> str:
        return s.rjust(widths[j]) if aligns[j] == "right" else s.ljust(widths[j])

    lines = []
    lines.append("| " + " | ".join(pad(heads[j], j) for j in range(ncols)) + " |")
    lines.append("|" + "|".join("-" * (widths[j] + 2) for j in range(ncols)) + "|")
    nrows = len(rows)
    for i in range(nrows):
        lines.append("| " + " | ".join(
            pad(col_texts[j][i], j) for j in range(ncols)) + " |")
    return "\n".join(lines)
