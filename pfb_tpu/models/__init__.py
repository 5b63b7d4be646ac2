"""Continuous component-model parametrisation (the mds contract):
fitting image cubes onto time/frequency bases and evaluating the fitted
models back onto arbitrary grids — equivalents of fit_image_cube /
eval_coeffs_to_* in the reference (pfb/utils/misc.py:1084-1313)."""

from pfb_tpu.models.comps import (eval_coeffs_to_cube,
                                  eval_coeffs_to_slice, fit_image_cube)
