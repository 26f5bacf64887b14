"""Merge discipline for measurement artifacts.

Round-4 postmortem: a failed bench re-run overwrote the only measured
H2O number out of BENCH_MS_H2O.json (the snapshot commit recorded a bare
error object where commit 75b319d had a measured 250k entry).  Bench
tools must MERGE into their JSON artifacts, never clobber: a failed
re-run may annotate a previous success, but can never delete it.

Artifacts are JSON lists of entry dicts keyed by "metric" (or single
dicts, which are treated as one-element lists).  Merge rules:
  - new successful entry (no "error" key) with the same "metric"
    replaces the old entry (its previous value is preserved under
    "superseded" so history stays in the file);
  - new FAILED entry never replaces an old success -- it is recorded
    on the old entry as "last_error" / "last_error_at";
  - unmatched metrics append.
"""

import json
import os


def _key(entry):
    return entry.get("metric") or entry.get("name") or ""


def merge_artifact(path, new_entries, keep_superseded=False):
    """Merge new_entries (list of dicts) into the JSON artifact at path.

    Returns the merged list (also written to path).
    """
    if isinstance(new_entries, dict):
        new_entries = [new_entries]
    old = []
    if os.path.exists(path):
        try:
            with open(path) as f:
                old = json.load(f)
            if isinstance(old, dict):
                old = [old]
        except Exception:
            old = []
    merged = list(old)
    index = {_key(e): i for i, e in enumerate(merged) if _key(e)}
    for entry in new_entries:
        k = _key(entry)
        i = index.get(k)
        if i is None:
            index[k] = len(merged)
            merged.append(entry)
            continue
        prev = merged[i]
        new_failed = "error" in entry and "value" not in entry
        prev_ok = "error" not in prev or "value" in prev
        if new_failed and prev_ok:
            # annotate, never clobber a success
            prev = dict(prev)
            prev["last_error"] = entry["error"]
            for extra in ("error_at", "session"):
                if extra in entry:
                    prev["last_" + extra] = entry[extra]
            merged[i] = prev
        else:
            if prev_ok and keep_superseded:
                entry = dict(entry)
                entry["superseded"] = {
                    k2: prev[k2] for k2 in ("value", "unit", "protocol")
                    if k2 in prev
                }
            merged[i] = entry
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(merged, f, indent=1)
        f.write("\n")
    os.replace(tmp, path)
    return merged
