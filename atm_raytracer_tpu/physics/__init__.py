"""Physics core: atmosphere model + refraction ray integrator.

Native re-implementation of the capabilities the reference pulls from the
external Rust crate ``atm-refraction`` v0.6 (reference Cargo.toml:8; call
sites: src/generator/params.rs:514-523, src/generator/generators/utils.rs:142-171,
src/atm_printer.rs:33-44, src/ray_path.rs:57-95, src/renderer/mod.rs:425).

Host side (numpy, f64): piecewise temperature model, hydrostatic pressure,
refractive index n(h, wavelength) — ``atmosphere``.
Device side (JAX, f32): batched fixed-step RK4 ray marching — ``ray``.
"""

from .atmosphere import (
    Atmosphere,
    AtmosphereDef,
    LinearFunction,
    SplineFunction,
    us_76,
    atmosphere_def_from_dict,
    atmosphere_def_to_dict,
)
from .ray import RefractionTable, march_rays, EarthShape

__all__ = [
    "Atmosphere",
    "AtmosphereDef",
    "LinearFunction",
    "SplineFunction",
    "us_76",
    "atmosphere_def_from_dict",
    "atmosphere_def_to_dict",
    "RefractionTable",
    "march_rays",
    "EarthShape",
]
