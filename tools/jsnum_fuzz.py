#!/usr/bin/env python3
"""Differential fuzz of graft.geonames.JsNum.render (the engine's
ECMAScript Number->String kernel, the NDJSON sink's fidelity-critical
renderer) against node's own JSON.stringify on the SAME IEEE-754 bit
patterns. Java 17's Double.toString is round-trippable but not always
shortest-form (JDK-4511638, fixed in 19), which is why JsNum computes
shortest digits itself; this harness is the loud proof that the
selection (nearest round-tripping candidate, ties to even) matches V8
bit-for-bit across the regimes no TSV corpus exercises: uniform random
bit patterns (subnormals, binade edges, NaN/Inf payloads), random short
decimals (coordinate-like), and a hand-picked hard-case list.

Usage: python3 tools/jsnum_fuzz.py [N_random=200000] [seed=14]
Exits 0 and prints a one-line JSON summary on full agreement.
"""
import json
import os
import random
import struct
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 14
rng = random.Random(SEED)

HARD = [
    "0000000000000000", "8000000000000000",  # ±0
    "0000000000000001", "8000000000000001",  # ±min subnormal (5e-324)
    "000fffffffffffff", "0010000000000000",  # subnormal/normal edge
    "7fefffffffffffff", "ffefffffffffffff",  # ±MAX_VALUE
    "7ff0000000000000", "fff0000000000000",  # ±Inf
    "7ff8000000000000", "7ff0000000000001",  # NaNs
    "4340000000000000", "4340000000000001",  # 2^53, 2^53+2
    "3fb999999999999a", "3fd3333333333333",  # 0.1, 0.3
    "44b52d02c7e14af6", "4b4a1ae4d6e2ef50",  # 1e23, 1e22-ish
    "3eb0c6f7a0b5ed8d", "3e7ad7f29abcaf48",  # 1e-6, 1e-7
]


def gen_bits():
    bits = list(HARD)
    for _ in range(N):
        bits.append(f"{rng.getrandbits(64):016x}")
    # coordinate-like short decimals: d.dd / d.ddddd across magnitudes
    for _ in range(N // 4):
        mag = rng.choice([1e-7, 1e-4, 1e-2, 1, 1e2, 1e5, 1e12, 1e20, 1e22])
        v = round(rng.uniform(-180, 180), rng.randint(0, 7)) * mag
        bits.append(f"{struct.unpack('<Q', struct.pack('<d', v))[0]:016x}")
    # integral doubles across the 2^53 edge
    for _ in range(N // 8):
        v = float(rng.getrandbits(rng.randint(1, 60)))
        bits.append(f"{struct.unpack('<Q', struct.pack('<d', v))[0]:016x}")
    return bits


NODE_PROG = r"""
const lines = [];
process.stdin.on('data', c => lines.push(c));
process.stdin.on('end', () => {
  const out = [];
  for (const hex of lines.join('').split('\n')) {
    if (!hex) continue;
    const buf = Buffer.from(hex, 'hex');
    out.push(JSON.stringify(buf.readDoubleBE(0)));
    if (out.length % 65536 === 0) { process.stdout.write(out.join('\n') + '\n'); out.length = 0; }
  }
  if (out.length) process.stdout.write(out.join('\n') + '\n');
});
"""


def main():
    bits = gen_bits()
    payload = "\n".join(bits) + "\n"
    node = subprocess.run(["node", "-e", NODE_PROG], input=payload,
                          capture_output=True, text=True, check=True)
    jars = ":".join(os.path.join("/opt/spark/jars", j)
                    for j in os.listdir("/opt/spark/jars") if j.endswith(".jar"))
    cp = os.path.join(REPO, "target/scala-2.13/classes") + ":" + jars
    jvm = subprocess.run(["java", "-cp", cp, "graft.tools.JsNumFuzz"],
                         input=payload, capture_output=True, text=True,
                         check=True)
    want = node.stdout.splitlines()
    got = jvm.stdout.splitlines()
    assert len(want) == len(bits) and len(got) == len(bits), \
        f"line counts: node {len(want)} jvm {len(got)} in {len(bits)}"
    diffs = [(b, w, g) for b, w, g in zip(bits, want, got) if w != g]
    for b, w, g in diffs[:10]:
        print(f"DIFF bits={b} node={w} jvm={g}", file=sys.stderr)
    print(json.dumps({"metric": "jsnum_fuzz", "cases": len(bits),
                      "seed": SEED, "diffs": len(diffs)}))
    sys.exit(1 if diffs else 0)


if __name__ == "__main__":
    main()
