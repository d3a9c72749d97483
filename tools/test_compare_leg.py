#!/usr/bin/env python3
"""Self-test for the same-run pairing rule in compare_oracle.py: a
fit-family output stamped with one Verify leg must REFUSE to compare
against oracle literals stamped with another leg (the r14 campaign's
false-red root cause), and must compare normally when the legs match
or when stamps are absent (pre-r16 back-compat).

Run: python3 tools/test_compare_leg.py   (exit 0 = all assertions hold)
"""
import io, json, os, sys, tempfile, contextlib
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import compare_oracle


def make_outdir(tmp, out_leg, oracle_leg):
    out = os.path.join(tmp, "out")
    qdir = os.path.join(out, "q_pca")
    os.makedirs(qdir, exist_ok=True)
    pq.write_table(pa.table({"x": pa.array([1], type=pa.int64())}),
                   os.path.join(qdir, "part-0.parquet"))
    with open(os.path.join(out, "oracle_sql.json"), "w") as f:
        json.dump({"q_pca": "SELECT 1 AS x"}, f)
    if out_leg is not None:
        with open(os.path.join(qdir, "_LEG"), "w") as f:
            f.write(out_leg)
    if oracle_leg is not None:
        with open(os.path.join(out, "oracle_leg.json"), "w") as f:
            json.dump({"leg": oracle_leg}, f)
    return out


def run(sf_dir, out):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = compare_oracle.main(sf_dir, out)
    return rc, buf.getvalue()


def main():
    # compare_oracle creates a view per table eagerly, so each table needs
    # a (dummy) parquet even though 'SELECT 1 AS x' reads none of them
    with tempfile.TemporaryDirectory() as tmp:
        sf = os.path.join(tmp, "sf"); os.makedirs(sf)
        for t in compare_oracle.TABLES:
            pq.write_table(pa.table({"x": pa.array([1], type=pa.int64())}),
                           os.path.join(sf, f"{t}.parquet"))

        rc, text = run(sf, make_outdir(tmp, "legA-1_2", "legB-1_2"))
        assert rc == 1 and "CROSS-LEG pairing refused" in text \
            and "SAME Verify JVM" in text, \
            f"cross-leg pairing did not refuse loudly:\n{text}"

        rc, text = run(sf, make_outdir(tmp, "legA-1_2", "legA-1_2"))
        assert rc == 0 and "OK   q_pca" in text, \
            f"same-leg pairing should compare green:\n{text}"

        rc, text = run(sf, make_outdir(tmp, None, None))
        assert rc == 0 and "OK   q_pca" in text, \
            f"stamp-less (pre-r16) pairing should still compare:\n{text}"

        # non-fit-family queries never refuse, even cross-leg
        out = make_outdir(tmp, "legA-1_2", "legB-1_2")
        os.rename(os.path.join(out, "q_pca"), os.path.join(out, "q1_agg"))
        with open(os.path.join(out, "oracle_sql.json"), "w") as f:
            json.dump({"q1_agg": "SELECT 1 AS x"}, f)
        rc, text = run(sf, out)
        assert rc == 0 and "OK   q1_agg" in text, \
            f"non-fit query must ignore leg stamps:\n{text}"

    print("test_compare_leg: 4/4 assertions pass")
    return 0


if __name__ == "__main__":
    sys.exit(main())
