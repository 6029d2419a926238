from .ionflux import IonFluxTables, build_ionflux_tables, calc_ion_flux

__all__ = ["IonFluxTables", "build_ionflux_tables", "calc_ion_flux"]
