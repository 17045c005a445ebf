"""Wave 53: CSV dialect sniffing — infer (delimiter, header) from raw
bytes before committing a scan configuration.

A real crawl's "CSV" drop is a zoo: comma, semicolon (decimal-comma
locales), tab, pipe, with and without header rows.  Hard-coding
`sep=","` silently mis-parses entire files into one-column garbage —
no error, just wrong data, which at 100 TB means a poisoned table
nobody notices until a downstream join returns nothing.  The triage
pass here reads ONE bounded sample per file (head bytes — constant
work per file regardless of file size) and infers:

  * delimiter — the candidate whose per-line field count is CONSTANT
    and maximal across sample lines (quote-aware: delimiters inside
    double-quoted fields don't count; the csv.Sniffer consistency
    idea, re-implemented so behavior is pinned by OUR tests rather
    than stdlib version drift);
  * header — line 1 has no numeric-parsing field while line 2 has at
    least one (the classic type-contrast heuristic).

The inferred dialect then configures the actual distributed
`spark.read.csv` — sniff on the driver over samples, scan on the
cluster with explicit options, never inferSchema-by-accident.
"""

from __future__ import annotations

_CANDIDATES = (",", ";", "\t", "|")
_QUOTE = '"'


def _split_quoted(line: str, delim: str) -> list[str]:
    """Field split honoring double-quoted sections (embedded delimiters
    and doubled quotes stay inside the field)."""
    fields: list[str] = []
    cur: list[str] = []
    in_q = False
    i = 0
    while i < len(line):
        ch = line[i]
        if in_q:
            if ch == _QUOTE:
                if i + 1 < len(line) and line[i + 1] == _QUOTE:
                    cur.append(_QUOTE)
                    i += 1
                else:
                    in_q = False
            else:
                cur.append(ch)
        elif ch == _QUOTE:
            in_q = True
        elif ch == delim:
            fields.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    fields.append("".join(cur))
    return fields


def _is_number(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def sniff_csv_dialect(sample: bytes) -> tuple[str, bool]:
    """(delimiter, has_header) from a head-of-file sample.

    Raises ValueError when no candidate delimiter yields a constant
    field count > 1 over the sample lines — the signal to quarantine
    the file rather than scan it with a guess."""
    text = sample.decode("utf-8", errors="replace")
    lines = [ln for ln in text.splitlines() if ln.strip()][:50]
    if len(lines) < 2:
        raise ValueError("need ≥2 non-empty sample lines to sniff")
    best: tuple[int, str] | None = None
    for delim in _CANDIDATES:
        counts = {len(_split_quoted(ln, delim)) for ln in lines}
        if len(counts) == 1:
            (n,) = counts
            if n > 1 and (best is None or n > best[0]):
                best = (n, delim)
    if best is None:
        raise ValueError(
            "no candidate delimiter gives a constant multi-field split "
            "— quarantine the file instead of guessing"
        )
    delim = best[1]
    first = _split_quoted(lines[0], delim)
    second = _split_quoted(lines[1], delim)
    has_header = (
        not any(_is_number(f) for f in first)
        and any(_is_number(f) for f in second)
    )
    return delim, has_header
