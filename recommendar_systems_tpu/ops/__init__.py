from recommendar_systems_tpu.ops.spectral import (
    spectral_filter,
    unit_magnitude,
    band_energies,
    haar_dwt1,
    haar_idwt1,
    wiener_shrink,
)
