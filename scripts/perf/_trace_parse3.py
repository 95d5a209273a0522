import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import glob, gzip, json
paths = glob.glob("/tmp/trace_scale/**/*.trace.json.gz", recursive=True)
targets = {"fusion.2", "copy.120", "copy.122", "select_bitcast_fusion",
           "reshape.15", "pad", "copy.107", "copy.110", "copy.116", "copy.105",
           "multiply_reduce_fusion.7", "fusion.30", "fusion.90", "fusion.92", "fusion.91"}
seen = {}
for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and e.get("name") in targets and e["name"] not in seen:
            a = e.get("args", {})
            seen[e["name"]] = (a.get("long_name", "")[:180], a.get("source", ""), a.get("tf_op", "")[:120])
for name in sorted(seen):
    ln, src, op = seen[name]
    print(f"--- {name}\n    {ln}\n    src: {src}\n    op: {op}")
