"""Join a profiler trace with its HLO dump: device time by model module.

Usage: python tools/trace_by_module.py <trace_logdir> <hlo.txt> [ndispatch]
"""
import collections, glob, gzip, json, re, sys

def main(logdir, hlo_path, ndisp=3):
    op_name = {}
    for line in open(hlo_path):
        m = re.match(r"\s+(?:ROOT )?%([\w.-]+) = ", line)
        if not m: continue
        mm = re.search(r'op_name="([^"]+)"', line)
        if mm: op_name[m.group(1)] = mm.group(1)

    p = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(p) as f: tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [p_ for p_, n in pids.items() if "TPU" in str(n)]

    def group(nm):
        if "_moe_p" in nm: return "moe_adapters"
        if "pallas" in nm or "forward_tokens/run_chain" in nm: return "pallas"
        if re.search(r"block_\d", nm):
            if "_windowed_attn" in nm or "attn" in nm: return "block.attn"
            if "mlp" in nm: return "block.mlp"
            return "block.other"
        if "embed" in nm or "frontend" in nm or "stft" in nm or "bn0" in nm: return "embed/frontend"
        if "downsample" in nm or "merg" in nm: return "downsample"
        if "roll" in nm: return "roll"
        return "other:" + "/".join(nm.split("/")[2:4])

    agg = collections.Counter(); bts = collections.Counter(); cnt = collections.Counter()
    tot = 0
    for e in ev:
        if e.get("ph") != "X" or e["pid"] not in dev: continue
        if re.match(r"jit_", e["name"]): continue
        args = e.get("args") or {}
        ln = args.get("long_name", "")
        m = re.match(r"%([\w.-]+) = ", ln)
        inst = m.group(1) if m else e["name"]
        nm = op_name.get(inst, "")
        g = group(nm) if nm else ("pallas" if "custom" in e["name"] or "forward_tokens" in e["name"] else "unattributed:" + e["name"])
        agg[g] += e["dur"]; cnt[g] += 1
        bts[g] += int(args.get("bytes_accessed", 0))
        tot += e["dur"]
    n = int(ndisp)
    print(f"{'ms/fwd':>8} {'%':>5} {'GB/fwd':>7} {'GB/s':>6} {'cnt':>6}  group")
    for g, v in agg.most_common(25):
        bw = bts[g] / (v * 1e-6) / 1e9 if v else 0
        print(f"{v/1e3/n:8.2f} {v/tot*100:5.1f} {bts[g]/1e9/n:7.2f} {bw:6.0f} {cnt[g]//n:6d}  {g}")
    print(f"{tot/1e3/n:8.2f} total    {sum(bts.values())/1e9/n:7.2f} GB/fwd")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else 3)
