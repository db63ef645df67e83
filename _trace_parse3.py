import glob, gzip, json, collections
path = glob.glob("/tmp/trace_scan/**/*.trace.json.gz", recursive=True)[0]
with gzip.open(path, "rt") as f:
    tr = json.load(f)
events = tr["traceEvents"]
names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
tpid = [p for p, n in names.items() if "TPU" in n and "XLA Ops" in n] or \
       [p for p, n in names.items() if "TPU" in n]
agg = collections.Counter(); args = {}
for e in events:
    if e.get("ph") == "X" and e.get("pid") in tpid:
        n = e["name"]
        if n.startswith(("jit_", "while")):
            continue
        agg[n] += e.get("dur", 0) / 1e3
        if n not in args:
            args[n] = e.get("args", {})
T = 12
print("top ops by tf_op / source:")
for n, ms in agg.most_common(45):
    a = args.get(n, {})
    src = a.get("tf_op", "")
    print(f"{ms/T:8.3f}  {n[:32]:32s} {src[:130]}")
