"""Optional adapter for the external ShaEP alignment binary.

Functional parity target: utils/evaluation/shaep_utils.py:14-57 (write mol
files, shell out to `shaep`, read the aligned SDF back, score with analytic
ROCS). The primary alignment path in this framework is the self-contained
overlap maximizer (eval/similarity.align_by_overlap); this adapter exists
for users who have the ShaEP binary installed and want its alignments."""
from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import Optional, Tuple

from shapemol_tpu.chem.mol import Molecule
from shapemol_tpu.chem.sdf import to_molblock, read_sdf
from shapemol_tpu.eval.similarity import get_rocs


def shaep_available(shaep_path: str = "shaep") -> bool:
    return shutil.which(shaep_path) is not None


def shaep_align(reference: Molecule, query: Molecule,
                shaep_path: str = "shaep", only_shape: bool = True
                ) -> Tuple[Optional[Molecule], Optional[float], Optional[float]]:
    """Align `query` onto `reference` with ShaEP.

    Returns (aligned_query, shaep_similarity, rocs) or (None, None, None)
    when the binary is unavailable or fails."""
    if not shaep_available(shaep_path):
        return None, None, None
    with tempfile.TemporaryDirectory(prefix="shaep_") as tmp:
        ref_file = os.path.join(tmp, "ref.mol")
        qry_file = os.path.join(tmp, "query.mol")
        out_sdf = os.path.join(tmp, "aligned.sdf")
        out_txt = os.path.join(tmp, "sim.txt")
        with open(ref_file, "w") as f:
            f.write(to_molblock(reference, "ref"))
        with open(qry_file, "w") as f:
            f.write(to_molblock(query, "query"))
        cmd = [shaep_path]
        if only_shape:
            cmd.append("--onlyshape")
        cmd += ["-q", ref_file, qry_file, "-s", out_sdf, out_txt]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            aligned = read_sdf(out_sdf)
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            return None, None, None
        if not aligned:
            return None, None, None
        mol = aligned[0]
        sim = None
        if os.path.exists(out_txt):
            with open(out_txt) as f:
                lines = f.read().strip().splitlines()
            if len(lines) >= 2:
                try:
                    sim = float(lines[1].split("\t")[-1])
                except ValueError:
                    pass
        rocs = get_rocs(mol.pos, reference.pos)
        return mol, sim, rocs
