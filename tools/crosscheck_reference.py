#!/usr/bin/env python3
"""Cross-validation harness: execute the REFERENCE (main2.py / main.py,
copied verbatim to a scratch dir, never modified in place) and the Spark
engine on the SAME fixture corpus, then compare outputs value-wise per
SURVEY §7.4 (header byte-exact; rows keyed by event_id; row order ignored
— divergence D1; floats compared as doubles; booleans True/False).

Crash fixtures (F11/F12/F13 — divergence D4) are excluded: the reference
cannot process them at all.

Dev-only tool. Usage: python3 tools/crosscheck_reference.py
"""
import csv, json, shutil, subprocess, sys, tempfile
from pathlib import Path

REF = Path("/root/reference")
REPO = Path("/root/repo")


def write_corpus(base: Path):
    (base / "users").mkdir(parents=True)
    (base / "cards").mkdir(parents=True)
    shutil.copy(REF / "user-events-schema.json", base)
    shutil.copy(REF / "card-events-schema.json", base)
    shutil.copy(REF / "users-sample.json", base / "users" / "f01.json")
    shutil.copy(REF / "cards-complete-sample.json", base / "cards" / "f02.json")
    shutil.copy(REF / "cards-incomplete-sample.json", base / "cards" / "f03.json")

    def user(fid, **payload):
        ev = {"metadata": {"type": "user", "event_at": "2023-10-23 22:55:01",
                           "event_id": f"00000000-0000-4000-8000-{fid:012d}"},
              "payload": payload}
        (base / "users" / f"f{fid:02d}.json").write_text(json.dumps(ev))

    user(4, id=101, name="Alice Stone", address="1 Main St",
         job="Engineer, site reliability", score=0.5)
    user(5, id=102, name="Dr. Jane Doe PhD", address="2 Oak\nAve",
         job="Architect", score=0.25)
    user(6, id=103, name="Mr. Bob Smith", address="3 Elm Rd",
         job="Baker", score=0.75)
    user(7, id=104, name="Ann Lee Jr.", address="4 Pine Ln",
         job="Chef", score=0.125)
    user(8, id=105, name="Juan de la Cruz Santos III", address="5 Birch Blvd",
         job="Pilot", score=1.5)
    user(9, id=106, name="Bad Score", address="6 Cedar Ct",
         job="Clerk", score="high")  # type mismatch → dropped
    # F10: formats unenforced
    ev = {"metadata": {"type": "user", "event_at": "not-a-date",
                       "event_id": "not-a-uuid"},
          "payload": {"id": 107, "name": "Odd Dates", "address": "7 Walnut Way",
                      "job": "Scribe", "score": 0.0625}}
    (base / "users" / "f10.json").write_text(json.dumps(ev))
    (base / "users" / "notes.txt").write_text("not an event")  # F14
    # F13b: card missing required BOOLEAN — reference keeps it with a
    # BLANK active (restval=''), the null-boolean stringify trap
    ev = {"payload": {"id": 5002, "user_id": 301, "created_by_name": "No Active",
                      "updated_at": "2023-10-23 23:31:00",
                      "created_at": "2023-10-23 23:31:00"},
          "metadata": {"type": "card", "event_at": "2023-10-23 23:31:00",
                       "event_id": "00000000-0000-4000-8000-000000000013"}}
    (base / "cards" / "f13.json").write_text(json.dumps(ev))


def run_reference(base: Path, main: str):
    for f in ["main.py", "main2.py"]:
        shutil.copy(REF / f, base / f)
    r = subprocess.run([sys.executable, main], cwd=base,
                       capture_output=True, text=True, timeout=120)
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-2000:])
        sys.exit(f"reference {main} failed in {base}")


def run_engine(base: Path, mode: str):
    r = subprocess.run(
        ["sbt", f"runMain graft.etl.Runner {mode} {base}"],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        sys.exit("engine Runner failed")


def load(path: Path, key: str):
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    with open(path, newline="") as f:
        header = f.readline().rstrip("\r\n")
    return header, {r[key]: r for r in rows}


def norm(v: str) -> str:
    try:
        return repr(float(v))  # 0.5 vs .5 vs 5e-1 → same
    except ValueError:
        return v


def compare(name, ref_path, eng_path, key="event_id"):
    rh, ref = load(ref_path, key)
    eh, eng = load(eng_path, key)
    ok = True
    if rh != eh:
        print(f"FAIL {name}: header\n  ref={rh}\n  eng={eh}")
        ok = False
    if set(ref) != set(eng):
        print(f"FAIL {name}: keys ref-only={set(ref)-set(eng)} eng-only={set(eng)-set(ref)}")
        ok = False
    for k in set(ref) & set(eng):
        for col in ref[k]:
            a, b = norm(ref[k][col]), norm(eng[k].get(col, "<missing>"))
            if a != b:
                print(f"FAIL {name}: key={k} col={col} ref={a!r} eng={b!r}")
                ok = False
    if ok:
        print(f"OK   {name}: header byte-exact, {len(ref)} rows value-identical")
    return ok


def crosscheck(mode: str) -> bool:
    ref_main = {"v1": "main.py", "v2": "main2.py"}[mode]
    ref_base = Path(tempfile.mkdtemp(prefix=f"xref_{mode}_"))
    eng_base = Path(tempfile.mkdtemp(prefix=f"xeng_{mode}_"))
    write_corpus(ref_base)
    write_corpus(eng_base)
    run_reference(ref_base, ref_main)
    run_engine(eng_base, mode)
    ok = True
    files = ["users.csv", "cards.csv"] + (["metadata.csv"] if mode == "v2" else [])
    for f in files:
        ok &= compare(f"{mode}/{f}", ref_base / f, eng_base / f)
    # error log: compare (field, filename-basename) pairs
    def errs(p):
        out = set()
        for line in (p / "errors.log").read_text().splitlines():
            parts = line.split(", ")
            out.add((Path(parts[3]).name, parts[4].split(" is ")[0]))
        return out
    re_, ee = errs(ref_base), errs(eng_base)
    if re_ == ee:
        print(f"OK   {mode}/errors.log: {len(re_)} (file, field) pairs identical")
    else:
        print(f"FAIL {mode}/errors.log: ref={re_} eng={ee}")
        ok = False
    # quarantine dirs
    for d in ["users_schema_mismatches", "cards_schema_mismatches"]:
        rq = {p.name for p in (ref_base / d).glob("*")} if (ref_base / d).exists() else set()
        eq = {p.name for p in (eng_base / d).glob("*")} if (eng_base / d).exists() else set()
        if rq == eq:
            print(f"OK   {mode}/{d}: {sorted(rq)}")
        else:
            print(f"FAIL {mode}/{d}: ref={rq} eng={eq}")
            ok = False
    return ok


def main():
    ok = crosscheck("v2")
    ok &= crosscheck("v1")
    print("== CROSSCHECK", "PASS" if ok else "FAIL", "==")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
