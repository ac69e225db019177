"""--py-files packaging: ship this package to executors at runtime.

The production job ships as ``spark-submit --py-files logparse_spark.zip``
(BASELINE.json:6). When the engine is driven from an already-running
SparkSession whose workers don't have the repo on sys.path (the driver
harness, a notebook, an arbitrary cwd), ``ensure_shipped`` builds the
same zip on the fly and registers it with ``sc.addPyFile`` — content-
hashed filename so re-adding across sessions never collides, cached so
it runs once per SparkContext.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

_SHIPPED: set[tuple[int, str]] = set()


def build_pyfiles_zip(dest_dir: str | None = None) -> str:
    """Build logparse_spark-<hash>.zip importable from --py-files."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    files = []
    for root, _dirs, names in os.walk(pkg_dir):
        for n in sorted(names):
            if n.endswith(".py"):
                files.append(os.path.join(root, n))
    h = hashlib.md5()
    for f in sorted(files):
        h.update(f.encode())
        with open(f, "rb") as fh:
            h.update(fh.read())
    dest_dir = dest_dir or tempfile.gettempdir()
    zpath = os.path.join(dest_dir, f"logparse_spark-{h.hexdigest()[:12]}.zip")
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            for f in sorted(files):
                arc = os.path.join("logparse_spark", os.path.relpath(f, pkg_dir))
                z.write(f, arc)
        os.replace(tmp, zpath)
    return zpath


def ensure_shipped(spark) -> None:
    """Make ``import logparse_spark`` work on executor workers."""
    sc = spark.sparkContext
    zpath = build_pyfiles_zip()
    key = (id(sc), zpath)
    if key in _SHIPPED:
        return
    sc.addPyFile(zpath)
    _SHIPPED.add(key)
