"""Rule-based driver models (reference ``Driver_Models.py``)."""

from __future__ import annotations

from typing import Optional



def reg157_brake(
    x_ego: float, v_ego: float, x_front: float, v_front: float,
    max_decel: float = 6.0, reaction_margin: float = 0.35,
) -> Optional[float]:
    """UN Regulation 157-style emergency-brake rule.

    Returns the brake deceleration (−max_decel) when the time-to-collision
    with the lead vehicle falls below ``v_rel / (2·max_decel) + margin``,
    else None (no intervention) — reference ``Driver_Models.Reg157``.
    """
    v_rel = v_ego - v_front
    if v_rel == 0:
        return None
    ttc = abs(x_front - x_ego) / v_rel
    threshold = v_rel / (2 * max_decel) + reaction_margin
    if ttc > threshold:
        return -max_decel
    return None
