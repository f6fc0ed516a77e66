"""Integrator mode registry.

Maps the reference's boundmode strings (src/mcd_utils.py:24-190,
src/main.py:40-48) onto the unified stepper families. The broken/dead
reference variants are handled deliberately:
- MCD_DNF is implemented *working* (the reference never initializes its
  second network, src/vi_dnf.py:57 vs src/mcdboundingmachine.py:66-99).
- The dead Euler variant (src/mcd_under_me_e.py, exported nowhere) is not
  reproduced.
"""

from __future__ import annotations

from cmcd_tpu.integrators.base import IntegratorContext
from cmcd_tpu.integrators import overdamped as od
from cmcd_tpu.integrators import underdamped as ud
from cmcd_tpu.integrators.uha import evolve_uha

# mode -> (family, spec, needs_sn, sn_rho_dim_multiplier)
_OVERDAMPED = {
    "MCD_ULA": od.ULA,
    "MCD_ULA_sn": od.ULA_SN,
    "MCD_CAIS_sn": od.CAIS,
    "MCD_CAIS_var_sn": od.CAIS_VAR,
    "MCD_DNF": od.DNF,
}

_UNDERDAMPED = {
    "MCD_U_a-lp": ud.U_A_LP,
    "MCD_U_a-lp-sna": ud.U_A_LP_SNA,
    "MCD_U_a-lp-sn": ud.U_A_LP_SN,
    "MCD_U_e-lp": ud.U_E_LP,
    "MCD_U_e-lp-sna": ud.U_E_LP_SNA,
    "MCD_U_ea-lp-sn": ud.U_EA_LP_SN,
    "MCD_CAIS_UHA_sn": ud.CAIS_UHA,
}

ALL_MODES = ["UHA"] + list(_OVERDAMPED) + list(_UNDERDAMPED)

# Modes whose score network sees the state only (rho_dim=0)
# vs concat[z, rho] (rho_dim=dim). Mirrors src/mcdboundingmachine.py:66-99.
MODES_WITH_STATE_SN = [
    "MCD_ULA_sn",
    "MCD_U_e-lp-sna",
    "MCD_U_a-lp-sna",
    "MCD_CAIS_sn",
    "MCD_CAIS_var_sn",
    "MCD_DNF",
]
MODES_WITH_FULL_SN = [
    "MCD_U_a-lp-sn",
    "MCD_U_ea-lp-sn",
    "MCD_CAIS_UHA_sn",
]


def mode_uses_score_network(mode: str) -> bool:
    return mode in MODES_WITH_STATE_SN or mode in MODES_WITH_FULL_SN


def mode_sn_rho_dim(mode: str, dim: int) -> int:
    return dim if mode in MODES_WITH_FULL_SN else 0


def evolve(key, z, betas, params, ctx: IntegratorContext, mode: str):
    """Dispatch to the right stepper family (reference src/mcd_utils.py:24)."""
    if mode == "UHA":
        return evolve_uha(key, z, betas, params, ctx)
    if mode in _OVERDAMPED:
        return od.evolve_overdamped(key, z, betas, params, ctx, _OVERDAMPED[mode])
    if mode in _UNDERDAMPED:
        return ud.evolve_underdamped(key, z, betas, params, ctx, _UNDERDAMPED[mode])
    raise NotImplementedError(f"Mode not implemented: {mode}")
