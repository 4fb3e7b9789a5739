#!/usr/bin/env python3
"""Min-merge a fresh Bench run into the committed quiet record.

Usage: min_merge_bench.py FRESH.json BASE.json OUT.json PROVENANCE

Implements the recording methodology from BASELINE.md / the verify
skill: per entry, adopt the lower wall and lower cpu INDEPENDENTLY,
but never adopt a reading the fresh run itself flagged (noise_flags or
vsbest_flags) over an existing unflagged one — flagged readings are
upper bounds, not steady-state. Entries the base lacks are added from
the fresh run regardless (their flags carried so the record discloses
them). value / total_cpu_sec are recomputed as sums; PROVENANCE is
appended to merged_from.
"""
import json
import sys


def main() -> None:
    fresh_path, base_path, out_path, provenance = sys.argv[1:5]
    fresh = json.load(open(fresh_path))
    base = json.load(open(base_path))
    flagged = set(fresh.get("noise_flags", {})) | set(
        fresh.get("vsbest_flags", {}))

    queries = dict(base["queries"])
    cpu = dict(base.get("cpu_sec", {}))
    out_noise = dict(base.get("noise_flags", {}))
    out_vsbest = dict(base.get("vsbest_flags", {}))
    adopted_w, adopted_c, added = [], [], []

    for name, w in fresh["queries"].items():
        c = fresh.get("cpu_sec", {}).get(name)
        if name not in queries:
            queries[name] = w
            if c is not None:
                cpu[name] = c
            # a brand-new entry keeps its flags: the record must not
            # present a first hot reading as steady-state
            if name in fresh.get("noise_flags", {}):
                out_noise[name] = fresh["noise_flags"][name]
            if name in fresh.get("vsbest_flags", {}):
                out_vsbest[name] = fresh["vsbest_flags"][name]
            added.append(name)
            continue
        if name in flagged:
            continue  # prefer the committed unflagged reading
        base_flagged = name in out_noise or name in out_vsbest
        # an unflagged reading REPLACES a flagged committed one even
        # when slower — flagged readings are upper bounds, not
        # steady-state, so the first quiet measurement wins outright
        if w >= 0 and (w < queries[name] or base_flagged):
            queries[name] = w
            adopted_w.append(name)
            out_noise.pop(name, None)
            out_vsbest.pop(name, None)
        if c is not None and c >= 0 and (
                c < cpu.get(name, float("inf")) or base_flagged):
            cpu[name] = c
            adopted_c.append(name)

    merged = dict(base)
    merged["queries"] = dict(sorted(queries.items()))
    merged["cpu_sec"] = dict(sorted(cpu.items()))
    merged["value"] = round(sum(v for v in queries.values() if v >= 0), 3)
    merged["total_cpu_sec"] = round(
        sum(v for v in cpu.values() if v >= 0), 3)
    merged["noise_flags"] = out_noise
    merged["vsbest_flags"] = out_vsbest
    prior = base.get("merged_from", [])
    if isinstance(prior, str):
        prior = [prior]
    merged["merged_from"] = prior + [provenance]
    json.dump(merged, open(out_path, "w"), indent=1)
    open(out_path, "a").write("\n")
    print(f"added {len(added)} entries {added}")
    print(f"adopted wall for {len(adopted_w)}: {adopted_w}")
    print(f"adopted cpu for {len(adopted_c)}: {adopted_c}")
    print(f"skipped (flagged in fresh): {sorted(flagged & set(base['queries']))}")
    print(f"value {base['value']} -> {merged['value']}, "
          f"cpu {base.get('total_cpu_sec')} -> {merged['total_cpu_sec']}")


if __name__ == "__main__":
    main()
