"""Driver-contract integrity: every query has an oracle, and no dict
literal in __spark_entry__ silently drops an entry via a duplicate key
(later keys win in Python — an easy editing accident to miss)."""

import ast
import pathlib

import __spark_entry__ as entrymod


def test_every_query_has_an_oracle():
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert qs == oracles, (
        f"missing oracles: {sorted(qs - oracles)}; "
        f"orphan oracles: {sorted(oracles - qs)}"
    )


def test_no_duplicate_keys_in_contract_dicts():
    src = pathlib.Path(entrymod.__file__).read_text(encoding="utf-8")
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            keys = [k.value for k in node.keys if isinstance(k, ast.Constant)]
            dupes = {k for k in keys if keys.count(k) > 1}
            assert not dupes, f"duplicate dict keys at line {node.lineno}: {dupes}"


def test_query_callables_are_distinct():
    fns = list(entrymod.queries().values())
    assert len(fns) == len(set(fns)), "two query names map to the same callable"
