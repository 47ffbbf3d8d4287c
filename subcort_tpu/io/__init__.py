from subcort_tpu.io.nifti import NiftiImage, load_nii, save_nii  # noqa: F401
