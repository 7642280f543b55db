"""Deterministic golden fixture for the end-to-end pipeline
(FIXTURES.md F1-F9): a miniature definition file + per-sample
expression TSVs with planted structure.

Planted facts (all deterministic — no RNG, values derive from crc32):

- samples s1..s8; s1..s6 training (s1,s2,s3 tumorous via ``diagnosis
  ... TN``), s7,s8 predictive (s7 follows the tumorous pattern, s8 the
  normal pattern — ground truth for the accuracy check).
- types t1 (probes m001..m010) and t2 (probes g001..g030).
- correlation plants: g002 = 2*g001 (r=1), g003 = -g001 (r=-1);
  m002 = m001 (r=1). Constant probe g030 (zero variance -> NaN corr ->
  must be dropped, PreProcess.scala:75).
- separable plants: g010,g011,g012 ≈ pattern*(scale) with tumorous
  samples high (~200) and normal low (~10) — mutually correlated, so
  they form one component whose representative is still separable.
- ~1/7 of the random cells are missing (ALS completion path triggers,
  PreProcess.scala:127); planted probes are never missing.
- definition-file quirks (Input.scala:73,86,90): duplicate mapping for
  (t1,s1) where a decoy file precedes the real one (last wins); a
  mapping for undeclared type t3; a mapping for undeclared sample s9;
  a declared sample s0 with no files (must vanish).
"""

from __future__ import annotations

import os
import zlib

SAMPLES = [f"s{i}" for i in range(1, 9)]
TRAINING = SAMPLES[:6]
PREDICTIVE = SAMPLES[6:]
TUMOROUS = {"s1", "s2", "s3", "s7"}  # s7: ground truth only
T1_PROBES = [f"m{i:03d}" for i in range(1, 11)]
T2_PROBES = [f"g{i:03d}" for i in range(1, 31)]

SEPARABLE = {"g010", "g011", "g012"}
CONSTANT_PROBE = "g030"


def _unit(sample: str, probe: str) -> float:
    """Deterministic pseudo-random uniform in [0, 1)."""
    return (zlib.crc32(f"{sample}|{probe}".encode()) % 10_000) / 10_000.0


def value_for(sample: str, probe: str) -> float | None:
    """The planted data-generating process; None = missing cell."""
    s_idx = SAMPLES.index(sample)
    if probe == "g001":
        return 10.0 + 5.0 * s_idx
    if probe == "g002":
        return 2.0 * value_for(sample, "g001")
    if probe == "g003":
        return -value_for(sample, "g001")
    if probe == "m001":
        return 50.0 + 7.0 * s_idx
    if probe == "m002":
        return value_for(sample, "m001")
    if probe in SEPARABLE:
        scale = 1.0 + 0.1 * (int(probe[1:]) - 10)
        base = 200.0 if sample in TUMOROUS else 10.0
        return (base + 3.0 * s_idx) * scale
    if probe == CONSTANT_PROBE:
        return 7.0
    if zlib.crc32(f"miss|{sample}|{probe}".encode()) % 7 == 0:
        return None
    return round(1.0 + 99.0 * _unit(sample, probe), 3)


def write_fixture(root: str) -> str:
    """Materialize fixture tree under ``root``; returns the definition
    file path."""
    os.makedirs(root, exist_ok=True)
    file_map: list[tuple[str, str, str]] = []  # (type, sample, path)

    def write_expr(sample: str, typ: str, probes: list[str], fname: str,
                   decoy: bool = False) -> str:
        path = os.path.join(root, fname)
        with open(path, "w") as f:
            f.write("probe_id\traw_count\textra1\textra2\n")  # header row
            for p in probes:
                v = 1e9 if decoy else value_for(sample, p)
                if v is None:
                    continue
                f.write(f"{p}\t{v}\tignored\tignored\n")
        return path

    for s in SAMPLES:
        p1 = write_expr(s, "t1", T1_PROBES, f"{s}_t1.quant.txt")
        p2 = write_expr(s, "t2", T2_PROBES, f"{s}_t2.quant.txt")
        file_map.append(("t1", s, p1))
        file_map.append(("t2", s, p2))

    decoy = write_expr("s1", "t1", T1_PROBES, "s1_t1.DECOY.txt", decoy=True)
    t3_file = write_expr("s1", "t3", ["x001"], "s1_t3.quant.txt")

    def_path = os.path.join(root, "input.txt")
    with open(def_path, "w") as f:
        f.write("# golden fixture definition file\n")
        f.write(f"def\toutput\t{root}/predictions_%s%.tsv\n")
        f.write("def\tpc-threshold\t0.95\n")
        for t in ("t1", "t2"):
            f.write(f"def\tsample-type\t{t}\n")
        for s in TRAINING:
            f.write(f"def\tsample\t{s}\n")
        f.write("def\tsample\ts0\n")  # declared, no files -> dropped
        for s in PREDICTIVE:
            f.write(f"def\tpredictive\t{s}\n")
        for s in sorted(TUMOROUS - set(PREDICTIVE)):
            f.write(f"diagnosis\t{s}\tTN\n")
        # duplicate mapping: decoy first, real second -> last wins
        f.write(f"t1\ts1\t{decoy}\n")
        for typ, s, path in file_map:
            f.write(f"{typ}\t{s}\t{path}\n")
        f.write(f"t3\ts1\t{t3_file}\n")  # undeclared type -> ignored
        f.write(f"t1\ts9\t{file_map[0][2]}\n")  # undeclared sample -> ignored
        f.write("malformed line without tabs\n")
    return def_path
