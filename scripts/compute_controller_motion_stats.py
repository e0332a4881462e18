#!/usr/bin/env python
"""CLI: controller motion statistics (per hand + inter-hand coordination)
(reference: analysis/computation/compute_controller_motion_stats.py:56-610).

Expects controller_poses.csv with columns
  unix_time, hand (left|right), pos_x..z, rot_x..w
or per-hand files left_controller_poses.csv / right_controller_poses.csv.
"""

import argparse
import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mq3d_tpu.eval.motion_stats import compute_motion_stats


def load_hand(session: Path, hand: str):
    import pandas as pd

    combined = session / "controller_poses.csv"
    per_hand = session / f"{hand}_controller_poses.csv"
    if combined.exists():
        df = pd.read_csv(combined, on_bad_lines="skip").dropna()
        df = df[df["hand"].str.lower() == hand]
    elif per_hand.exists():
        df = pd.read_csv(per_hand, on_bad_lines="skip").dropna()
    else:
        return None
    df = df.sort_values("unix_time")
    return (
        df["unix_time"].to_numpy() / 1000.0,
        df[["pos_x", "pos_y", "pos_z"]].to_numpy(),
        df[["rot_x", "rot_y", "rot_z", "rot_w"]].to_numpy(),
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("sessions", type=Path, nargs="+")
    args = parser.parse_args()

    out = {}
    for session in args.sessions:
        entry = {}
        hands = {}
        for hand in ("left", "right"):
            data = load_hand(session, hand)
            if data is None:
                continue
            t, pos, rot = data
            entry[hand] = dataclasses.asdict(compute_motion_stats(t, pos, rot))
            hands[hand] = (t, pos)
        # Inter-hand coordination: correlation of speeds on the common range.
        if len(hands) == 2:
            (tl, pl), (tr, pr) = hands["left"], hands["right"]
            n = min(len(tl), len(tr))
            if n > 2:
                sl = np.linalg.norm(np.diff(pl[:n], axis=0), axis=-1)
                sr = np.linalg.norm(np.diff(pr[:n], axis=0), axis=-1)
                if sl.std() > 0 and sr.std() > 0:
                    entry["coordination_speed_corr"] = float(
                        np.corrcoef(sl, sr)[0, 1]
                    )
        if entry:
            out[str(session)] = entry
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
