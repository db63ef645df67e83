import glob, gzip, json, collections, re
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
agg = collections.Counter(); cnt = collections.Counter(); args = {}
for e in events:
    if e.get("ph") == "X" and e.get("pid") in tpid:
        n = e["name"]
        if n.startswith(("jit_", "while")):  # parents double-count
            continue
        agg[n] += e.get("dur", 0) / 1e3
        cnt[n] += 1
        if n not in args:
            args[n] = e.get("args", {})
T = 12
total = sum(agg.values())
print(f"leaf busy {total:.1f} ms = {total/T:.2f} ms/frame")
buckets = collections.Counter()
def bucket(n):
    if "_flash_call" in n: return "flash"
    if n.startswith("copy"): return "copy"
    if "convolution" in n: return "conv"
    if "convert_reduce" in n: return "LN-stats"
    if n.startswith(("dot", "bitcast_dot")) or "dot_fusion" in n: return "dot"
    if n.startswith(("dynamic-update-slice", "dynamic_update")): return "dus"
    if n.startswith(("dynamic-slice", "dynamic_slice")): return "ds"
    if "reduce" in n: return "reduce"
    if n.startswith("fusion"): return "fusion"
    return "other"
for n, ms in agg.items():
    buckets[bucket(n)] += ms
for b, ms in buckets.most_common():
    print(f"  {b:10s} {ms/T:7.2f} ms/frame")
print()
print("top ops with shapes:")
for n, ms in agg.most_common(28):
    a = args.get(n, {})
    ln = a.get("long_name", a.get("tf_op", ""))[:150]
    print(f"{ms/T:8.3f} {cnt[n]:5d}  {n[:40]:40s} {ln}")
