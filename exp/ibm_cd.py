"""IBM static-cylinder drag-coefficient trajectory + resolution convergence.

Round-5 task 7 artifact: cd(t) histories at three Eulerian resolutions for
the reference's ibm-static production case (2D cylinder r=0.5 in a
[-3,3]^2 box, uniform Re=10 inflow), with the drag computed from the
virtual flux exactly as the reference's computeDragForce
(src/cases/immersed_boundary.py:115-160; here ibm/bodies.py
compute_force). Writes exp/ibm_cd_r05.json.

Usage: python exp/ibm_cd.py [t_end] [out.json]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def cfg_for(nelem, t_end, max_steps=4000):
    return {
        "name": "ibm-cd",
        "save-n-steps": 10,                      # force_every = 1
        "material-properties": {"rho": 0.5, "mu": 0.01},
        "domain": {"ngl": 3, "box-mesh": {
            "nelem": [nelem, nelem], "lower": [-3, -3], "upper": [3, 3]}},
        "time-solver": {"start-time": 0, "end-time": float(t_end),
                        "max-steps": max_steps},
        "boundary-conditions": {"uniform": {
            "re": 10, "direction": 0, "Lref": "1", "rho": 0.5,
            "mu": 0.01}},
        "initial-conditions": {"vorticity": [0]},
        "bodies": [{"type": "circle", "vel": "static", "radius": 0.5,
                    "center": [0, 0]}],
    }


def main():
    t_end = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    out = sys.argv[2] if len(sys.argv) > 2 else "exp/ibm_cd_r05.json"
    from pynama_tpu.cases.ibm import ImmersedBoundaryStatic

    runs = {}
    for nelem in (35, 50, 70):
        p = ImmersedBoundaryStatic(cfg_for(nelem, t_end), solver="cg",
                                   cg_rtol=1e-6, cg_maxiter=800)
        t0 = time.time()
        p.setUp()
        print(f"nelem={nelem}: setup {time.time()-t0:.1f}s, h={p.h:.4f}, "
              f"{p.body.n_nodes} lag points", flush=True)
        t0 = time.time()
        t, steps = p.start_solver(rtol=1e-4, atol=1e-4)
        cd = np.array(p.history["cd_phys"])
        times = np.array(p.history["times"])
        tail = cd[times > 0.7 * t] if (times > 0.7 * t).any() else cd[-5:]
        print(f"  t={t:.2f} steps={steps} wall={time.time()-t0:.0f}s "
              f"cd_phys_tail={tail.mean():.4f} +- {tail.std():.4f}",
              flush=True)
        runs[nelem] = {
            "h": p.h, "lag_points": int(p.body.n_nodes),
            "t_reached": float(t), "steps": int(steps),
            "cd_phys_tail_mean": float(tail.mean()),
            "cd_phys_tail_std": float(tail.std()),
            "times": times.tolist(),
            "cd_phys": cd.tolist(), "cl_phys": p.history["cl_phys"],
            "cd_reference_definition": [c[0] for c in p.history["cd"]],
        }

    doc = {
        "case": ("static cylinder r=0.5 in [-3,3]^2, uniform inflow "
                 "Re=10 (reference src/cases/ibm-static.yaml). cd_phys = "
                 "momentum the correction imparts per unit time / "
                 "(0.5 rho U^2 D), the physically normalized drag; "
                 "cd_reference_definition = raw flux sum per "
                 "computeDragForce (immersed_boundary.py:115-160), a "
                 "resolution-scaled trace kept for parity"),
        "runs": {str(k): v for k, v in runs.items()},
    }
    with open(out, "w") as f:
        json.dump(doc, f)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
