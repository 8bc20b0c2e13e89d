"""Package zipping for the ``spark-submit --py-files`` deployment contract
(BASELINE.json north_star). ``get_spark`` ships the zip automatically via
``addPyFile`` so Python workers can import the package regardless of cwd —
the local-mode equivalent of distributing it to a 1000-executor cluster.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(dest_path: str | None = None) -> str:
    """Zip the package (py files only); return the zip path."""
    if dest_path is None:
        dest_path = os.path.join(
            tempfile.gettempdir(), "univer_ocr_spark_pyfiles.zip"
        )
    pkg_root = os.path.join(_REPO_ROOT, "univer_ocr_spark")
    tmp = f"{dest_path}.tmp.{os.getpid()}"  # pid-unique: concurrent sessions must not race
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, _REPO_ROOT))
    os.replace(tmp, dest_path)
    return dest_path


def ship_package(spark) -> str:
    """Build + register the zip on the running session's SparkContext."""
    path = build_zip()
    spark.sparkContext.addPyFile(path)
    return path
