"""Build the --py-files archive for cluster submission.

    python tools/make_pyfiles_zip.py [dist/pyspark_frontier.zip]
    spark-submit --py-files dist/pyspark_frontier.zip \
        distributed_web_crawling_and_indexing_system_gcp_spark/cli.py crawl ...

The archive contains the engine package only (no tests/tools); executors
import it from the zip directly.
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PKG = "distributed_web_crawling_and_indexing_system_gcp_spark"


def main():
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "dist" / "pyspark_frontier.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / PKG).rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
            n += 1
    print(f"wrote {out} ({n} files)")


if __name__ == "__main__":
    main()
