"""Vendored-protobuf fallback for ``transformWithStateInPandas``.

Spark 4's typed-state streaming API speaks protobuf between the Python
worker and the JVM state server (``pyspark.sql.streaming.proto.
StateMessage_pb2``), which needs the ``google.protobuf`` runtime — a
package some runtimes (this one included) don't ship. ``vendor/google/
protobuf`` carries the pure-Python protobuf runtime (6.32.0, BSD-3 —
see ``vendor/README.md`` for provenance); this module puts it on
``sys.path`` when and only when the real package is absent.

Two environment details make the fallback work end-to-end:

- ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK=true`` — protobuf's own
  documented escape hatch. Spark's gencode is 6.33.0, one MINOR ahead
  of the vendored 6.32.0 runtime; the wire format is stable within a
  major version, so the strict gencode<=runtime check is safely relaxed
  (it would hard-fail otherwise). Set before the JVM launches so local-
  mode Python workers (forked from the JVM's daemon) inherit it.
- the vendor tree also ships to executors inside the ``addPyFile`` zip
  (``session._ship_package``), so a real cluster's workers can import
  it too; on a real cluster additionally set
  ``spark.executorEnv.TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK=true``.

The pure-Python runtime is the slow protobuf path — fine for the state
protocol's small control messages; deployments with the real
``protobuf`` package installed never enter this fallback.
"""

from __future__ import annotations

import importlib.util
import os
import sys

#: repo-root vendor dir (package sits one level below the repo root)
VENDOR_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vendor")


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable, preferring any real install.

    Returns True iff ``google.protobuf`` is importable afterwards.
    Idempotent and cheap — call before anything that might import
    ``StateMessage_pb2`` (driver side) or launch the JVM (worker side
    inherits the env var at JVM spawn).
    """
    try:
        if importlib.util.find_spec("google.protobuf") is not None:
            return True
    except ModuleNotFoundError:
        pass  # no 'google' namespace at all
    if not os.path.isdir(os.path.join(VENDOR_DIR, "google", "protobuf")):
        return False
    if VENDOR_DIR not in sys.path:
        sys.path.insert(0, VENDOR_DIR)
    os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
    # Python workers the JVM spawns (the typed-state API's schema-
    # validation "driver worker" included) build their sys.path from the
    # PYTHONPATH the JVM inherited — so this must land in os.environ
    # BEFORE the JVM launches, which get_spark guarantees by calling
    # ensure_protobuf() first.
    pp = os.environ.get("PYTHONPATH", "")
    if VENDOR_DIR not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            VENDOR_DIR + (os.pathsep + pp if pp else "")
        )
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False
