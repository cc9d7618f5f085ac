"""Post-write Turtle shard validation (S7).

Reference surface: ``validate_turtle_files.sh`` runs the ``ttl`` CLI
over every output file. Neither that tool nor rdflib ships in this
container, so validation is (a) rdflib when importable, else (b) a
strict parser of the exact block grammar our renderer emits
(``subject pred obj ;\\n\\tpred obj ... .`` blocks separated by blank
lines), cross-checked against each shard's lineage manifest (triple
count + sha256)."""

from __future__ import annotations

import hashlib
import json
import os


def _parse_blocks(text: str) -> int:
    """Parse our Turtle dialect; returns the triple count, raises
    ValueError on malformed structure."""
    if not text:
        return 0
    n = 0
    for block in text.split("\n\n"):
        if not block.strip():
            continue
        if not block.endswith(" ."):
            raise ValueError(f"block missing terminator: {block[:80]!r}")
        body = block[:-2]
        subj, rest = body.split(" ", 1)
        if not subj:
            raise ValueError("empty subject")
        for pair in rest.split(" ;\n\t"):
            pred, obj = pair.split(" ", 1)
            if not pred or not obj:
                raise ValueError(f"malformed pair: {pair[:80]!r}")
            n += 1
    return n


def validate_turtle_dir(out_dir: str) -> dict:
    """Validate every shard in a materialized output directory.

    Checks, per shard: parses under the grammar (rdflib if available),
    byte sha256 matches the manifest, parsed triple count matches the
    manifest. Returns a report; raises ValueError on the first corrupt
    shard."""
    try:
        import rdflib  # noqa: F401

        have_rdflib = True
    except ImportError:
        have_rdflib = False

    report = {"shards": 0, "triples": 0, "rdflib": have_rdflib}
    mdir = os.path.join(out_dir, "_manifests")
    for fname in sorted(os.listdir(out_dir)):
        if not fname.endswith(".ttl") or fname == "header.ttl":
            continue
        pid = int(fname.split("-")[1].split(".")[0])
        path = os.path.join(out_dir, fname)
        raw = open(path, "rb").read()
        text = raw.decode("utf-8")

        with open(os.path.join(mdir, f"part-{pid:05d}.json")) as f:
            manifest = json.load(f)
        digest = hashlib.sha256(raw).hexdigest()
        if digest != manifest["sha256"]:
            raise ValueError(f"{fname}: sha256 mismatch vs manifest")

        if have_rdflib:
            import rdflib

            header = open(os.path.join(out_dir, "header.ttl")).read()
            rdflib.Graph().parse(data=header + text, format="turtle")
        n = _parse_blocks(text)
        if n != manifest["n_triples"]:
            raise ValueError(
                f"{fname}: {n} parsed triples != manifest {manifest['n_triples']}"
            )
        report["shards"] += 1
        report["triples"] += n
    return report
