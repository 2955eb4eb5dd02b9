"""Guard: every module that ships Python functions to executors must
register for by-value pickling (see proto_to_avro_ql_spark/pickling.py
— executor workers don't inherit the driver's sys.path, so by-reference
closures die under the driver's vanilla-session scenario)."""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parents[1] / "proto_to_avro_ql_spark"

# markers of worker-executed python code
WORKER_MARKERS = re.compile(
    r"mapInPandas|pandas_udf|applyInPandas|DataSourceReader"
)  # DataSource API classes ALSO execute in python workers (planning + read)
REGISTERED = "register_self_contained(__name__)"

# entry_registry's UDFs are nested closures (pickled by value already)
# whose package references resolve to registered modules; session.py
# only mentions pandas_udf in a comment.
EXEMPT = {"entry_registry.py", "session.py", "pickling.py"}


def test_worker_shipping_modules_are_self_contained():
    missing = []
    for path in PKG.rglob("*.py"):
        if path.name in EXEMPT:
            continue
        src = path.read_text()
        if WORKER_MARKERS.search(src) and REGISTERED not in src:
            missing.append(str(path.relative_to(PKG)))
    assert not missing, (
        f"modules shipping code to workers without by-value registration: {missing}"
    )


def test_entry_registry_udfs_are_closures_not_module_level():
    """entry_registry may define UDFs only INSIDE functions (closures
    pickle by value); a module-level UDF there would be pickled by
    reference to a module workers can't import."""
    src = (PKG / "entry_registry.py").read_text()
    for match in re.finditer(r"^(\s*)@pandas_udf", src, re.MULTILINE):
        assert match.group(1), "module-level @pandas_udf in entry_registry.py"
