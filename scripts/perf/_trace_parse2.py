import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import glob, gzip, json
from collections import defaultdict
paths = glob.glob("/tmp/trace_scale/**/*.trace.json.gz", recursive=True)
targets = {"slice_reduce_fusion.5", "fusion.2", "negate_reduce_fusion",
           "copy.120", "fusion.13", "multiply_reduce_fusion.2",
           "multiply_reduce_fusion.1", "multiply_reduce_fusion",
           "select_bitcast_fusion", "pad", "fusion.3", "fusion.4",
           "copy.122", "reshape.15", "sort.30", "fusion.110", "fusion.108"}
seen = {}
for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and e.get("name") in targets and e["name"] not in seen:
            seen[e["name"]] = e.get("args", {})
for name, args in seen.items():
    print(f"--- {name}")
    for k, v in args.items():
        print(f"    {k}: {str(v)[:300]}")
