"""OTSL table codec: cell matrix <-> OTSL token stream.

Re-implements the reference's OTSL grammar (export: document.py:1674-1765;
parse: types/doc/utils.py:96-282):

    <fcel> full cell   <ecel> empty cell
    <lcel> left-merge   <ucel> up-merge   <xcel> 2d-merge
    <nl> row end
    <ched> column header  <rhed> row header  <srow> section row

One deliberate extension vs. the reference parser: ``parse_otsl``
preserves the header/section semantics of ched/rhed/srow as cell flags
(the reference parser drops them, utils.py:236-252), so that a table
round-tripped through spans keeps its header structure for
export_to_dataframe-style header inference (document.py:1559-1610).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

T_FCEL = "<fcel>"
T_ECEL = "<ecel>"
T_LCEL = "<lcel>"
T_UCEL = "<ucel>"
T_XCEL = "<xcel>"
T_NL = "<nl>"
T_CHED = "<ched>"
T_RHED = "<rhed>"
T_SROW = "<srow>"

_CELL_OPEN = (T_FCEL, T_CHED, T_RHED, T_SROW)
_ALL_STRUCT = (T_FCEL, T_ECEL, T_LCEL, T_UCEL, T_XCEL, T_NL, T_CHED,
               T_RHED, T_SROW)
_TOKEN_RE = re.compile(r"(<[^>]+>)")


class Cell:
    """One table cell (TableCell analogue, document.py:299-341)."""

    __slots__ = ("text", "start_row", "end_row", "start_col", "end_col",
                 "column_header", "row_header", "row_section")

    def __init__(self, text: str, start_row: int, end_row: int,
                 start_col: int, end_col: int, column_header: bool = False,
                 row_header: bool = False, row_section: bool = False) -> None:
        self.text = text
        self.start_row = start_row
        self.end_row = end_row
        self.start_col = start_col
        self.end_col = end_col
        self.column_header = column_header
        self.row_header = row_header
        self.row_section = row_section

    @property
    def row_span(self) -> int:
        return self.end_row - self.start_row

    @property
    def col_span(self) -> int:
        return self.end_col - self.start_col


class Table:
    """TableData analogue: sparse cells + dense span-expanded grid
    (document.py:367-407)."""

    __slots__ = ("cells", "num_rows", "num_cols", "_grid")

    def __init__(self, cells: List[Cell], num_rows: int, num_cols: int) -> None:
        self.cells = cells
        self.num_rows = num_rows
        self.num_cols = num_cols
        self._grid: Optional[List[List[Cell]]] = None

    @property
    def grid(self) -> List[List[Cell]]:
        if self._grid is None:
            g = [
                [Cell("", i, i + 1, j, j + 1) for j in range(self.num_cols)]
                for i in range(self.num_rows)
            ]
            for cell in self.cells:
                for i in range(min(cell.start_row, self.num_rows),
                               min(cell.end_row, self.num_rows)):
                    for j in range(min(cell.start_col, self.num_cols),
                                   min(cell.end_col, self.num_cols)):
                        g[i][j] = cell
            self._grid = g
        return self._grid


def parse_otsl(otsl: str) -> Table:
    """Token stream -> Table (cf. utils.py:136-268 semantics, plus header
    flag preservation)."""
    raw = _TOKEN_RE.split(otsl)
    # interleaved sequence of structural tokens and cell texts, like the
    # reference's mixed_texts; drop whitespace-only fragments
    seq = [p for p in raw if p.strip()]
    tokens = [p for p in seq if p in _ALL_STRUCT]

    # rows of structural tokens (split on <nl>)
    rows: List[List[str]] = []
    cur: List[str] = []
    for t in tokens:
        if t == T_NL:
            rows.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur:
        rows.append(cur)

    cells: List[Cell] = []
    r_idx = 0
    c_idx = 0
    n = len(seq)
    for i, tok in enumerate(seq):
        if tok in _CELL_OPEN or tok == T_ECEL:
            cell_text = ""
            right_offset = 1
            if tok != T_ECEL and i + 1 < n and seq[i + 1] not in _ALL_STRUCT:
                cell_text = seq[i + 1]
                right_offset = 2
            elif tok != T_ECEL:
                right_offset = 1  # cell token with no text payload

            col_span = 1
            row_span = 1
            next_right = seq[i + right_offset] if i + right_offset < n else ""
            next_bottom = ""
            if r_idx + 1 < len(rows) and c_idx < len(rows[r_idx + 1]):
                next_bottom = rows[r_idx + 1][c_idx]

            if next_right in (T_LCEL, T_XCEL):
                c = c_idx + 1
                while c < len(rows[r_idx]) and rows[r_idx][c] in (T_LCEL, T_XCEL):
                    col_span += 1
                    c += 1
            if next_bottom in (T_UCEL, T_XCEL):
                r = r_idx + 1
                while r < len(rows) and c_idx < len(rows[r]) and \
                        rows[r][c_idx] in (T_UCEL, T_XCEL):
                    row_span += 1
                    r += 1

            cells.append(Cell(
                text=cell_text.strip(),
                start_row=r_idx, end_row=r_idx + row_span,
                start_col=c_idx, end_col=c_idx + col_span,
                column_header=(tok == T_CHED),
                row_header=(tok == T_RHED),
                row_section=(tok == T_SROW),
            ))
        if tok in _ALL_STRUCT and tok != T_NL:
            c_idx += 1
        elif tok == T_NL:
            r_idx += 1
            c_idx = 0

    num_rows = len(rows)
    num_cols = max((len(r) for r in rows), default=0)
    return Table(cells, num_rows, num_cols)


def encode_otsl(table: Table, add_cell_text: bool = True) -> str:
    """Table -> token stream (cf. export_to_otsl, document.py:1674-1765,
    without <loc> tokens)."""
    body: List[str] = []
    grid = table.grid
    for i in range(table.num_rows):
        for j in range(table.num_cols):
            cell = grid[i][j]
            content = cell.text.strip()
            if cell.start_row == i and cell.start_col == j:
                if content:
                    if cell.column_header:
                        body.append(T_CHED)
                    elif cell.row_header:
                        body.append(T_RHED)
                    elif cell.row_section:
                        body.append(T_SROW)
                    else:
                        body.append(T_FCEL)
                    if add_cell_text:
                        body.append(content)
                else:
                    body.append(T_ECEL)
            else:
                cross = False
                if cell.start_row != i:
                    if cell.col_span == 1:
                        body.append(T_UCEL)
                    else:
                        cross = True
                if cell.start_col != j:
                    if cell.row_span == 1:
                        body.append(T_LCEL)
                    else:
                        cross = True
                if cross:
                    body.append(T_XCEL)
        body.append(T_NL)
    return "".join(body)


def table_rows_text(table: Table) -> List[List[str]]:
    """Dense grid of cell texts with newline->space cleanup, the rows fed
    to markdown rendering (markdown.py:286-323)."""
    return [[c.text.replace("\n", " ") for c in row] for row in table.grid]


def dataframe_like(table: Table) -> Tuple[Optional[List[str]], List[List[str]]]:
    """Replicate TableItem.export_to_dataframe header inference
    (document.py:1559-1610) without pandas.

    Returns (columns_or_None, data_rows). columns is None when no leading
    column-header rows exist (reference leaves pandas RangeIndex then).
    """
    grid = table.grid
    if table.num_rows == 0 or table.num_cols == 0:
        return None, []
    num_headers = 0
    for row in grid:
        if any(c.column_header for c in row):
            num_headers += 1
        else:
            break
    columns: Optional[List[str]] = None
    if num_headers > 0:
        columns = ["" for _ in range(table.num_cols)]
        for i in range(num_headers):
            for j, cell in enumerate(grid[i]):
                col_name = cell.text
                if columns[j] != "":
                    col_name = f".{col_name}"
                columns[j] += col_name
    data = [[c.text for c in row] for row in grid[num_headers:]]
    return columns, data


def triplet_text(table: Table) -> str:
    """Triplet serialization of a table (TripletTableSerializer,
    chunker/hierarchical_chunker.py:125-171).

    Header row is copied as row 0; emits "row_h, col_h = value" joined by
    ". " over cells (i>=1, j>=1) of the shifted frame. When the table has
    no header rows the reference's pandas frame has integer columns, so
    column names degrade to "0","1",... - replicated here.
    """
    columns, data = dataframe_like(table)
    nrows_df = len(data)
    ncols_df = table.num_cols
    if nrows_df < 1 or ncols_df < 2:
        return ""
    if columns is None:
        columns = [str(j) for j in range(ncols_df)]
    # shifted frame: row 0 = column names, rows 1.. = data
    frame = [columns] + data
    rows = [str(r[0]).strip() for r in frame]
    nrows = len(frame)
    parts = [
        f"{rows[i]}, {str(frame[0][j]).strip()} = {str(frame[i][j]).strip()}"
        for i in range(1, nrows)
        for j in range(1, ncols_df)
    ]
    return ". ".join(parts)
