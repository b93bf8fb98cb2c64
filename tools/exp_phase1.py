"""Phase-1 gate experiments (round 5): isolate the 25.9-vs-30 dB gap.

Hypotheses (VERDICT r4 "next round" #1):
  ceiling      — init AT the GT scene, run the literal schedule: does the
                 densify/reset machinery destabilize a converged scene?
  refine       — reference protocol *shape*: densify for the first half,
                 refine with a frozen population for the second half
                 (ref densify_until=15000 of 30000; the r4 gate evaluated
                 mid-densification, 1000 iters past an opacity reset).
  refine_cap18 — refine + doubled capacity ceiling (the r4 run saturated
                 131k and dropped 922k densification requests).

Run: python tools/exp_phase1.py <name>   (writes tools/exp_phase1_<name>.json)
"""
import json
import sys

sys.path.insert(0, ".")

from tools.quality_gate import run_phase1_gate

_SMALL = dict(size=64, iters=7000, n_train=64, n_test=8, capacity=8192,
              max_capacity=1 << 15, n_init=4000, densify_until=3000,
              eval_every=500, cameras_extent=1.5,
              compress_pos_schedule=False)

CFGS = {
    "ceiling": dict(iters=4000, init_at="gt", eval_every=500),
    "refine": dict(iters=14000, densify_until=7000, eval_every=1000),
    "refine_cap18": dict(iters=14000, densify_until=7000,
                         max_capacity=1 << 18, eval_every=1000),
    # Small fast repros of the post-densify refinement decay (r5):
    # densify stops at 3000; a healthy trainer should climb 3000->7000.
    "small": dict(_SMALL),
    "small_nonorm": dict(_SMALL, normal_weight=0.0, normal_tv_weight=0.0),
    "small_notv": dict(_SMALL, normal_tv_weight=0.0),
    "small_nonc": dict(_SMALL, normal_weight=0.0),
    # Adam-diffusion hypothesis: constant-LR groups random-walk when the
    # gradient signal is below the single-view noise floor (decay after
    # densify stops). If scaled LRs climb instead of decaying, the gate
    # needs resolution-aware LRs (the reference calibrated at 800px).
    "small_lr25": dict(_SMALL, lr_scale=0.25),
    "small_lr10": dict(_SMALL, lr_scale=0.10),
    # r5 two-stage follow-ups: the 131k-saturated 128px run equilibrates
    # at 26.4 under refine x0.3 while the GT-init diag (800 gaussians)
    # holds ~38 — population size drives the refinement noise floor.
    # cap15 bounds the population at 32768 (the level that hit 31.35 dB
    # from scratch at 64px) while keeping the literal densify constants.
    "cap15": dict(iters=6000, densify_until=3000, max_capacity=1 << 15,
                  eval_every=500),
    "cap16": dict(iters=6000, densify_until=3000, max_capacity=1 << 16,
                  eval_every=500),
    # refine_lr sweep on the bounded population
    "cap15_lr10": dict(iters=6000, densify_until=3000,
                       max_capacity=1 << 15, eval_every=500,
                       refine_lr_scale=0.1),
    # two-stage on the small 64px repro (expect it to HOLD ~31 where
    # lr-1.0 refinement decayed to 27.5)
    "small_twostage": dict(_SMALL),
    # Annealed refinement: geometric 0.3 -> 0.03 global lr over the
    # refine half + position schedule compressed to the gate horizon.
    "cap15_anneal": dict(iters=6000, densify_until=3000,
                         max_capacity=1 << 15, eval_every=500,
                         refine_lr_scale=0.3, refine_final=0.03),
    "cap15_anneal_long": dict(iters=10000, densify_until=4000,
                              max_capacity=1 << 15, eval_every=1000,
                              refine_lr_scale=0.5, refine_final=0.02),
    # Clone/split regime: percent_dense scaled by 800/size restores the
    # reference's clone-dominated growth (its 0.01*extent boundary is
    # ~11 px on lego@800px; literal at 128px it is sub-pixel, so every
    # visible splat splits, shredding the scene). cameras_extent also
    # fixed to the NeRF++-faithful ring radius (3.3, not 1.5).
    "cap15_pd": dict(iters=6000, densify_until=3000,
                     max_capacity=1 << 15, eval_every=500,
                     percent_dense=0.0625),
    "cap17_pd": dict(iters=6000, densify_until=3000,
                     max_capacity=1 << 17, eval_every=500,
                     percent_dense=0.0625),
    # Solid-surface GT: the 0.9-opacity fat-splat GT is a deep
    # translucent-stack inversion at 128px (the reference's synthetic
    # scenes are solid objects); opacity 0.99 makes the gate scene
    # reference-like.
    "cap15_opaque": dict(iters=6000, densify_until=3000,
                         max_capacity=1 << 15, eval_every=500,
                         gt_opacity=0.99),
}

if __name__ == "__main__":
    name = sys.argv[1]
    out = run_phase1_gate(**CFGS[name])
    with open(f"tools/exp_phase1_{name}.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"exp": name, "final": out["test_psnr"],
                      "trajectory": out["trajectory"]}))
