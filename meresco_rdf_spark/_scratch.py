"""Per-process scratch root for query/stream/roundtrip fixtures.

Advisor finding (round 4): bare ``tempfile.mkdtemp`` calls leaked one
``kg_publish_*`` / ``stream_*`` / ``rdf_fixtures_*`` directory per
correctness or bench invocation.  Every scratch consumer now allocates
under ONE root that is removed at interpreter exit — late enough that
lazy plans, restarted streams, and driver-side collects have all read
their fixture files, with zero leftover directories afterwards.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_SCRATCH_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """A fresh scratch directory under the per-process root."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="mrs_query_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH_ROOT)
