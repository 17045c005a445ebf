#!/usr/bin/env python
"""Dump .explain('formatted') for registry queries (plans/r13 evidence).

    python tools/explain_query.py <out.txt> <query> [sf_dir]
"""
import io, os, sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

def main():
    if len(sys.argv) < 3:
        print(__doc__.strip(), file=sys.stderr)
        sys.exit(2)
    out, name = sys.argv[1], sys.argv[2]
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    from vector_ai_npm_spark import registry
    from vector_ai_npm_spark.session import get_spark
    queries = registry.all_queries()
    if name not in queries:
        print(f"unknown query {name!r}", file=sys.stderr)
        sys.exit(2)
    spark = get_spark("explain")
    try:
        df = queries[name](spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        Path(out).write_text(buf.getvalue())
        print(f"wrote {out} ({len(buf.getvalue())} chars)")
    finally:
        spark.stop()

if __name__ == "__main__":
    main()
