"""Regenerate RESULTS.md: one table row per metrics file across every
results_* directory, so the full experiment record is navigable without
opening 38 JSONs. Run after adding a results dir:

  python tools/make_results_index.py
"""
from __future__ import annotations

import glob
import json
import os

# recipe provenance: dir prefix -> (checkpoint / recipe, what the run probes)
NOTES = {
    "results_real": ("stage-2 b32 (first real-data run, r2)", "baseline"),
    "results_real_ema": ("EMA b32 — stability leader", "r3 EMA recipe"),
    "results_b128": ("batch-128 EMA", "geometry-vs-batch probe"),
    "results_b128_guided": ("batch-128 EMA + pc-guidance", "r4 frontier"),
    "results_bf16": ("bf16 compute (measured negative)", "dtype ablation"),
    "results_voxel": ("voxel-AE conditioning", "conditioning family"),
    "results_voxel_ema": ("voxel-AE + EMA", "conditioning family"),
    "results_dual": ("dual pointAE+voxel conditioning", "capability the reference lacks"),
    "results_dual_guided": ("dual + pc-guidance", "r3 shape leader"),
    "results_dual_meshg": ("dual + mesh-SDF guidance", "guidance family"),
    "results_ema_guided": ("EMA b32 + pc-guidance", "guidance on the stability leader"),
    "results_full_ema": ("EMA b32, FULL 1000-target protocol", "reference protocol, unguided"),
    "results_full_ema_guided": ("EMA b32 + pc-guidance, FULL protocol", "previous default recipe"),
    "results_cfg_s0": ("CFG-trained ckpt, guide_stren 0", "CFG dose-response sweep"),
    "results_ceiling_own": ("EMA, own latent", "stage-1 ceiling probe"),
    "results_ceiling_resample": ("EMA, re-sampled-cloud latent", "stage-1 ceiling probe"),
    "results_ceiling_shuffle": ("EMA, shuffled latent", "stage-1 ceiling probe"),
    "results_best": ("consolidated dual+b128+EMA + pc-guidance", "shape-first recipe"),
    "results_jitter": ("EMA b32 + pos-jitter 0.02 Å", "augmentation probe — geometry leader"),
    "results_jitter01": ("EMA b32 + pos-jitter 0.01 Å", "jitter dose-response"),
    "results_jitter_guided": ("jitter 0.02 + pc-guidance", "balanced recipe"),
    "results_bestj_guided": ("consolidated + jitter (lever composition)", "measured negative"),
    "results_anneal": ("jitter 48k -> 12k jitter-free anneal", "tension-breaking probe"),
    "results_anneal2": ("jitter 48k -> 32k anneal (overfit)", "anneal dose-response"),
    "results_anneal_guided": ("jitter-anneal + pc-guidance", "balanced champion"),
    "results_cycle": ("second jitter->anneal cycle", "measured negative — no compounding"),
    "results_distill": ("EMA recipe on 900 real + 7200 self-distilled", "data-bound attack — 3-axis win"),
    "results_distill_ctrl": ("900 real only, same 100k schedule", "distill corpus-effect control"),
    "results_distill_guided": ("distill ckpt + pc-guidance", "new default candidate"),
    "results_distill_full": ("distill ckpt, FULL protocol", "stability record, unguided"),
    "results_distill_full_guided": ("distill + pc-guidance, FULL protocol", "recommended default recipe"),
    "results_distill_v3geom": ("geometry-NLL-filtered distill corpus", "flywheel counter-measure: reject on geometry"),
    "results_distill_v3geom_guided": ("v3geom + pc-guidance", "flywheel counter-measure: reject on geometry"),
    "results_distill_v2mix": ("distill-v2 corpus, real pack pinned at 25% batch share", "flywheel counter-measure: real-mix anchor"),
    "results_distill_v2mix_guided": ("v2mix + pc-guidance", "flywheel counter-measure: real-mix anchor"),
    "results_distill_ja": ("jitter 80k -> 20k anneal on the distill corpus", "jitter-anneal x distill composition"),
    "results_distill_ja_guided": ("distill jitter-anneal + pc-guidance", "jitter-anneal x distill composition"),
    "results_geom1": ("distill + bonded-distance loss w=1", "loss-shaping dose-response (r5)"),
    "results_geom10": ("distill + bonded-distance loss w=10", "loss-shaping dose-response (r5)"),
    "results_geom100": ("distill + bonded-distance loss w=100", "loss-shaping dose-response (r5)"),
    "results_geom10_guided": ("geom-loss winner + pc-guidance", "loss-shaping (r5)"),
    "results_geom100_guided": ("geom-loss winner + pc-guidance", "loss-shaping (r5)"),
    "results_dcfg_s0": ("distill-CFG ckpt, guide_stren 0", "CFG re-adjudication at distill scale (r5)"),
    "results_distill_v4strat": ("composition-stratified geometry-filtered corpus", "v3geom drift repair (r5)"),
    "results_distill_v5geom": ("geometry-filtered flywheel iteration 2", "flywheel compounds on the filtered axis (r5)"),
    "results_v3geom_full": ("v3geom ckpt, FULL protocol", "round-5 champion, unguided"),
    "results_distill_v4strat_guided": ("v4strat + pc-guidance", "v3geom drift repair (r5)"),
    "results_v4strat_full": ("v4strat ckpt, FULL protocol", "round-5 champion, unguided"),
    "results_v4strat_full_guided": ("v4strat + pc-guidance, FULL protocol", "round-5 champion, guided"),
    "results_v3geom_full_guided": ("v3geom + pc-guidance, FULL protocol", "round-5 champion, guided"),
    "results_distill_dual": ("distill corpus + dual conditioning", "distill x dual composition (r5)"),
    "results_distill_dual_guided": ("distill x dual + pc-guidance", "distill x dual composition (r5)"),
}


def note_for(d):
    if d in NOTES:
        return NOTES[d]
    if d.startswith("results_cfg_s"):
        tag = d[len("results_cfg_"):]
        return (f"CFG-trained ckpt, {tag.replace('_', ' + ', 1)}",
                "CFG dose-response sweep")
    if d.startswith("results_dcfg_s"):
        tag = d[len("results_dcfg_"):]
        return (f"distill-CFG ckpt, {tag} + rescale",
                "CFG re-adjudication at distill scale (r5)")
    return ("", "")


def main():
    rows = []
    for d in sorted(glob.glob("results_*")):
        for mf in sorted(glob.glob(os.path.join(d, "metrics*.json"))):
            try:
                m = json.load(open(mf))["metrics"]
            except Exception:
                continue
            rows.append((d, os.path.basename(mf), m))

    def fmt(m, k, p=3):
        return ("%.*f" % (p, m[k])) if k in m and m[k] is not None else "—"

    lines = [
        "# Results index",
        "",
        "Every quality run in the repo, regenerated by",
        "`tools/make_results_index.py`. `n` = molecules evaluated (50,000 =",
        "the complete reference protocol: 1000 targets × 50 samples,",
        "`scripts/sample_diffusion.py:168-175` + `data/index_map.txt`).",
        "Full context for each run: STATUS.md (rounds 2-3), STATUS_r4.md.",
        "",
        "| dir / metrics file | recipe | probes | n | mol_stable | CC-2Å JSD | ROCS mean | ROCS max | esp |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for d, f, m in rows:
        recipe, probes = note_for(d)
        lines.append(
            "| `%s/%s` | %s | %s | %s | %s | %s | %s | %s | %s |" % (
                d, f, recipe, probes, m.get("n_samples", "?"),
                fmt(m, "mol_stable"), fmt(m, "JSD_CC_2A"),
                fmt(m, "rocs_mean"), fmt(m, "rocs_max"),
                fmt(m, "esp_sim_mean")))
    lines.append("")
    open("RESULTS.md", "w").write("\n".join(lines))
    print(f"RESULTS.md: {len(rows)} rows")


if __name__ == "__main__":
    main()
