"""Self-contained pickling for worker-shipped Python functions.

The driver contract imports this package via a sys.path patch
(__spark_entry__.py) — but executor Python workers don't inherit the
driver's sys.path, so any UDF closure cloudpickle serializes BY
REFERENCE ("import proto_to_avro_ql_spark.x on the worker") dies with
ModuleNotFoundError the moment a vanilla session runs it from a
foreign CWD (observed in the round-2 driver simulation on
src_proto_decode / ext_multimodal).

Fix: register the few modules whose functions actually execute on
workers for BY-VALUE pickling — the function bodies and the globals
they touch travel inside the serialized task, no worker-side import at
all. This is also the correct posture for a real cluster where the
package isn't pip-installed on executors (the alternative,
sc.addPyFile, requires staging a zip per session).

Only the worker-executing leaf modules are registered (protodec,
multimodal, sessionize) — registering the whole package would bloat
every task with the registry's SQL text.
"""

from __future__ import annotations

import sys


def register_self_contained(module_name: str) -> None:
    """Pickle ``module_name``'s functions/classes by value. Call at the
    bottom of any module that ships code to executors."""
    try:
        from pyspark import cloudpickle
    except ImportError:  # pragma: no cover - pyspark always present here
        return
    cloudpickle.register_pickle_by_value(sys.modules[module_name])
