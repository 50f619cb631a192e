"""Registry lifecycle checks (no Spark session needed).

r8 VERDICT wrong #1: the ``CHANGED_THIS_ROUND`` pin tuple kept being
left populated after the driver had already recorded the pinned
queries' fresh CORRECTNESS rows, silently burning driver slots the
next round.  This test encodes the lifecycle: once
``CORRECTNESS_r{CHANGED_ROUND}.json`` exists with a green row for
every pinned name, the pins are spent and must be reset.
"""

import glob
import json
import os

from cdc_practice_spark.queries import registry

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green(row: dict) -> bool:
    return bool(row.get("rows_match")) and row.get("err") is None


def test_changed_this_round_pins_not_spent():
    """Pins must be reset once their round's CORRECTNESS file records them."""
    pins = registry.CHANGED_THIS_ROUND
    if not pins:
        return
    path = os.path.join(ROOT, f"CORRECTNESS_r{registry.CHANGED_ROUND:02d}.json")
    if not os.path.exists(path):
        return  # driver hasn't run for this round yet — pins are live
    rows = json.load(open(path))
    spent = [n for n in pins if n in rows and _green(rows[n])]
    assert len(spent) < len(pins), (
        f"CHANGED_THIS_ROUND pins {pins} all have green rows in "
        f"{os.path.basename(path)} — they are spent; reset the tuple and "
        f"bump CHANGED_ROUND (registry.py)."
    )


def test_changed_round_not_stale():
    """CHANGED_ROUND must be at least the newest committed CORRECTNESS round.

    If the driver has written CORRECTNESS_r{N}.json for N > CHANGED_ROUND,
    the round counter (and hence any pins) was forgotten at round start.
    """
    newest = 0
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        try:
            newest = max(newest, int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")]))
        except ValueError:
            continue
    assert registry.CHANGED_ROUND >= newest, (
        f"CHANGED_ROUND={registry.CHANGED_ROUND} but CORRECTNESS_r{newest:02d}.json "
        f"exists — bump CHANGED_ROUND and reset CHANGED_THIS_ROUND at round start."
    )


def test_pinned_names_are_registered():
    import __spark_entry__  # noqa: F401  (populates the registry)

    for name in registry.CHANGED_THIS_ROUND:
        assert name in registry.QUERIES, f"pinned unknown query {name!r}"
