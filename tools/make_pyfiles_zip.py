"""Package flagembedding_spark for ``spark-submit --py-files``.

Usage:
    python tools/make_pyfiles_zip.py [out.zip]
    spark-submit --py-files dist/flagembedding_spark.zip jobs/build_index_job.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "flagembedding_spark.zip"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "flagembedding_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)


if __name__ == "__main__":
    main()
