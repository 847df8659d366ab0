"""LBM <-> physical unit conversion.

API parity with reference xlb/utils/utils.py:450-537 (UnitConvertor), plus
small helpers for the common Reynolds-number setup used across examples.
"""


class UnitConvertor:
    """Converts between lattice units and physical units.

    The conversion is anchored by a reference velocity in both unit systems
    and the physical voxel size; the derived reference time is the physical
    duration of one LBM timestep.
    """

    def __init__(
        self,
        velocity_lbm_unit: float,
        velocity_physical_unit: float,
        voxel_size_physical_unit: float,
        density_physical_unit: float = 1.2041,
        pressure_physical_unit: float = 1.101325e5,
    ):
        self.velocity_lbm_unit = float(velocity_lbm_unit)
        self.velocity_phys_unit = float(velocity_physical_unit)
        self.voxel_size = float(voxel_size_physical_unit)
        self.reference_density = float(density_physical_unit)
        self.reference_pressure = float(pressure_physical_unit)

    @property
    def time_step_physical(self):
        return self.voxel_size * self.velocity_lbm_unit / self.velocity_phys_unit

    @property
    def reference_length(self):
        return self.voxel_size

    @property
    def reference_time(self):
        return self.time_step_physical

    @property
    def reference_velocity(self):
        return self.reference_length / self.reference_time

    # -- conversions ------------------------------------------------------
    def length_to_lbm(self, x):
        return x / self.reference_length

    def length_to_physical(self, x):
        return x * self.reference_length

    def time_to_lbm(self, t):
        return t / self.reference_time

    def time_to_physical(self, t):
        return t * self.reference_time

    def density_to_lbm(self, rho):
        return rho / self.reference_density

    def density_to_physical(self, rho):
        return rho * self.reference_density

    def velocity_to_lbm(self, v):
        return v / self.reference_velocity

    def velocity_to_physical(self, v):
        return v * self.reference_velocity

    def viscosity_to_lbm(self, nu):
        return nu * self.reference_time / self.reference_length**2

    def viscosity_to_physical(self, nu):
        return nu * self.reference_length**2 / self.reference_time

    def pressure_to_lbm(self, p):
        return (p - self.reference_pressure) / (self.reference_density * self.reference_velocity**2)

    def pressure_to_physical(self, p):
        return self.reference_pressure + (p - 1.0 / 3.0) * self.reference_density * self.reference_velocity**2


def omega_from_reynolds(reynolds: float, char_velocity_lbm: float, char_length_lbm: float) -> float:
    """Relaxation rate omega for a target Reynolds number:
    nu = u L / Re, tau = 3 nu + 1/2, omega = 1/tau."""
    nu = char_velocity_lbm * char_length_lbm / reynolds
    return 1.0 / (3.0 * nu + 0.5)


def viscosity_from_omega(omega: float) -> float:
    """Lattice kinematic viscosity nu = cs^2 (1/omega - 1/2)."""
    return (1.0 / omega - 0.5) / 3.0
