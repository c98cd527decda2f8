"""Mechanical enforcement of the _FRESH gate pin (VERDICT r4 item 2).

The driver's correctness gate records only a prefix of the registry;
`__spark_entry__._ordered` pins this round's new/changed queries into
that prefix via the hand-maintained _FRESH list.  Round 3 showed the
failure mode when the hand fails: a rewritten query sat in the dropped
tail for a round.  This test closes that hole — any query whose
oracle SQL or function source differs from the committed snapshot
MUST be named in _PRIORITY + _FRESH, so forgetting the pin fails CI
instead of silently skipping the gate.

Refreshing the snapshot is part of each round's commit:
    python -c 'import __spark_entry__ as e; e.write_snapshot()'
"""

import json

import __spark_entry__ as entry_mod


def _load_snapshot() -> dict:
    with open(entry_mod.SNAPSHOT_PATH) as fh:
        return json.load(fh)


def test_changed_or_new_queries_are_pinned_fresh():
    fp = entry_mod.query_fingerprints()
    snap = _load_snapshot()
    pinned = set(entry_mod._PRIORITY) | set(entry_mod._FRESH)
    changed = sorted(n for n, h in fp.items()
                     if snap.get(n) != h and n not in pinned)
    assert not changed, (
        f"queries changed since the committed snapshot but not pinned "
        f"in _PRIORITY/_FRESH: {changed} — add them to "
        f"__spark_entry__._FRESH (so this round's driver gate covers "
        f"them) and refresh tests/query_hash_snapshot.json")


def test_snapshot_has_no_deleted_queries():
    fp = entry_mod.query_fingerprints()
    gone = sorted(n for n in _load_snapshot() if n not in fp)
    assert not gone, (
        f"snapshot entries for queries no longer registered: {gone} — "
        f"refresh tests/query_hash_snapshot.json")


def test_fresh_pins_reference_real_queries():
    fp = entry_mod.query_fingerprints()
    stale = sorted(n for n in entry_mod._FRESH + entry_mod._PRIORITY
                   if n not in fp)
    assert not stale, f"_FRESH/_PRIORITY name unknown queries: {stale}"
