"""Driver-contract guard: __ray_entry__ must keep its shape
(entry() Dataset with stable schema; oracle keys subset of queries;
no ray.init anywhere in the import chain)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.usefixtures("ray_session")
def test_entry_contract():
    import __ray_entry__ as m

    ds = m.entry()
    n = ds.count()
    assert n > 0
    names = set(ds.schema().names)
    assert {"doc_id", "tier", "window_id", "cnt", "sum", "min", "max",
            "mean"} <= names


def test_queries_oracle_alignment():
    import __ray_entry__ as m

    q = m.queries()
    o = m.oracle_sql()
    assert len(q) >= 40
    assert set(o) <= set(q)
    assert len(o) >= 25
    # every oracle is non-trivial SQL mentioning a registered view
    views = ("documents", "events", "lineitem", "embeddings",
             "orders", "customer", "supplier", "part", "nation",
             "region")
    for name, sql in o.items():
        assert any(v in sql for v in views), name


def test_no_ray_init_in_library():
    """Library modules must not CALL ray.init (driver owns the session);
    docstring mentions are fine — so check the AST, not the text."""
    import ast
    import pathlib

    def calls_ray_init(path):
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "init"
                and isinstance(node.func.value, ast.Name)
                and node.func.value.id == "ray"
            ):
                return True
        return False

    root = pathlib.Path(__file__).resolve().parent.parent
    offenders = [
        str(p)
        for p in (root / "anofox_forecast_ray").rglob("*.py")
        # job.py is the `ray job submit` CLI entrypoint — per the repo
        # invariant, CLI entry points (like bench.py) own their session
        if calls_ray_init(p) and p.name != "job.py"
    ]
    assert not calls_ray_init(root / "__ray_entry__.py")
    assert offenders == [], offenders
