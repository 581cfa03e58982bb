"""Program registry: every CLI endpoint maps to module[:class].

Grows toward the full 209-program surface of SURVEY.md Appendix A.
"""
from xmipp3_tpu.programs import register

P = "xmipp3_tpu.programs."

register("align_significant", P + "align_significant")
register("transform_filter", P + "transform_filter")
register("transform_geometry", P + "transform_geometry")
register("transform_normalize", P + "transform_normalize")
register("transform_window", P + "transform_misc:ProgTransformWindow")
register("transform_add_noise", P + "transform_misc:ProgTransformAddNoise")
register("transform_threshold", P + "transform_misc:ProgTransformThreshold")
register("transform_mirror", P + "transform_misc:ProgTransformMirror")
register("transform_randomize_phases",
         P + "transform_misc:ProgTransformRandomizePhases")
register("transform_downsample", P + "transform_misc:ProgTransformDownsample")
register("image_operate", P + "image_operate")
register("image_align", P + "image_align")
register("image_resize", P + "image_misc:ProgImageResize")
register("image_convert", P + "image_misc:ProgImageConvert")
register("image_header", P + "image_misc:ProgImageHeader")
register("image_statistics", P + "image_misc:ProgImageStatistics")
register("image_histogram", P + "image_misc:ProgImageHistogram")
register("metadata_utilities", P + "metadata_utilities")
register("reconstruct_fourier", P + "reconstruct_fourier")
register("angular_project_library", P + "angular_project_library")
register("angular_projection_matching", P + "angular_projection_matching")
register("resolution_fsc", P + "resolution_fsc")
register("ctf_estimate_from_micrograph",
         P + "ctf_estimate:ProgCTFEstimateFromMicrograph")
register("ctf_estimate_from_psd", P + "ctf_estimate:ProgCTFEstimateFromPSD")
register("movie_alignment_correlation",
         P + "movie_alignment:ProgMovieAlignmentCorrelation")
register("movie_filter_dose", P + "movie_alignment:ProgMovieFilterDose")
register("movie_estimate_gain", P + "movie_alignment:ProgMovieEstimateGain")
register("resolution_monogenic_signal", P + "resolution_misc:ProgMonoRes")
register("resolution_monotomo", P + "resolution_misc:ProgMonoTomo")
register("resolution_fso", P + "resolution_misc:ProgFSO")
register("resolution_localfilter",
         P + "resolution_misc:ProgResolutionLocalFilter")
register("volume_correct_bfactor",
         P + "resolution_misc:ProgVolumeCorrectBfactor")
register("volume_structure_factor",
         P + "resolution_misc:ProgVolumeStructureFactor")
register("classify_CL2D", P + "classify:ProgClassifyCL2D")
register("ml_align2d", P + "classify:ProgMLAlign2D")
register("classify_kerdensom", P + "classify:ProgKerdensom")
register("phantom_create", P + "phantom_programs:ProgPhantomCreate")
register("phantom_project", P + "phantom_programs:ProgPhantomProject")
register("phantom_simulate_microscope",
         P + "phantom_programs:ProgPhantomSimulateMicroscope")
register("metadata_split", P + "metadata_misc:ProgMetadataSplit")
register("metadata_import", P + "metadata_misc:ProgMetadataImport")
register("metadata_histogram", P + "metadata_misc:ProgMetadataHistogram")
register("angular_distance", P + "metadata_misc:ProgAngularDistance")
register("angular_rotate", P + "metadata_misc:ProgAngularRotate")
register("ctf_phase_flip", P + "ctf_correct:ProgCTFPhaseFlip")
register("ctf_correct_wiener2d", P + "ctf_correct:ProgCTFCorrectWiener2D")
register("ctf_group", P + "ctf_correct:ProgCTFGroup")
register("ctf_sort_psds", P + "ctf_correct:ProgCTFSortPSDs")
register("ctf_enhance_psd", P + "ctf_correct:ProgCTFEnhancePSD")
register("micrograph_scissor", P + "micrograph_programs:ProgMicrographScissor")
register("micrograph_automatic_picking",
         P + "micrograph_programs:ProgMicrographAutomaticPicking")
register("reconstruct_art", P + "reconstruct_misc:ProgReconstructART")
register("reconstruct_wbp", P + "reconstruct_misc:ProgReconstructWBP")
register("reconstruct_significant",
         P + "reconstruct_misc:ProgReconstructSignificant")
register("image_vectorize", P + "image_analysis:ProgImageVectorize")
register("image_sort", P + "image_analysis:ProgImageSortChain")
register("image_sort_by_statistics",
         P + "image_analysis:ProgImageSortByStatistics")
register("image_find_center", P + "image_analysis:ProgImageFindCenter")
register("image_ssnr", P + "image_analysis:ProgImageSSNR")
register("image_eliminate_empty_particles",
         P + "image_analysis:ProgEliminateEmptyParticles")
register("matrix_dimred", P + "image_analysis:ProgMatrixDimred")
register("image_rotational_pca", P + "image_analysis:ProgImageRotationalPCA")
register("tomo_project", P + "tomo_programs:ProgTomoProject")
register("tomo_simulate_tilt_series",
         P + "tomo_programs:ProgTomoSimulateTiltSeries")
register("tomo_extract_subtomograms",
         P + "tomo_programs:ProgTomoExtractSubtomograms")
register("tomo_average_subtomos", P + "tomo_programs:ProgTomoAverageSubtomos")
register("tomo_tiltseries_dose_filter",
         P + "tomo_programs:ProgTomoTiltseriesDoseFilter")
register("tomo_detect_missing_wedge",
         P + "tomo_programs:ProgTomoDetectMissingWedge")
register("volume_from_pdb", P + "volume_programs:ProgVolumeFromPDB")
register("volume_center", P + "volume_programs:ProgVolumeCenter")
register("volume_align", P + "volume_programs:ProgVolumeAlign")
register("volume_subtraction", P + "volume_programs:ProgVolumeSubtraction")
register("volume_segment", P + "volume_programs:ProgVolumeSegment")
register("transform_mask", P + "volume_programs:ProgTransformMask")
register("transform_symmetrize", P + "volume_programs:ProgTransformSymmetrize")
register("volume_to_pseudoatoms",
         P + "volume_programs:ProgVolumeToPseudoatoms")

register("angular_continuous_assign2",
         P + "angular_programs:ProgAngularContinuousAssign2")
register("angular_class_average",
         P + "angular_programs:ProgAngularClassAverage")
register("angular_neighbourhood",
         P + "angular_programs:ProgAngularNeighbourhood")
register("subtract_projection", P + "angular_programs:ProgSubtractProjection")
register("image_residuals", P + "angular_programs:ProgImageResiduals")

# ---------------------------------------------------------------------------
# mpi_* endpoints (reference SURVEY.md Appendix A lists 51): in the reference
# these wrap serial engines with an MPI master-worker layer; here each mpi_
# name dispatches to its twin, and the compute-heavy twins take a --mesh flag
# (default auto = dp when >1 device is visible; parallel/cli.py) that runs
# the hot path sharded over the jax device mesh (outputs equal to serial by
# construction — the reference guarantees the same via MDL_GATHER_ID
# sorting). Mesh-wired: reconstruct_fourier (dp psum / kz-slab) and
# angular_projection_matching (dp / gallery-sharded tp); see
# docs/COVERAGE.md L4 for the current list. The remaining mpi_ names alias
# per-image metadata programs whose batches already run as single jitted
# device programs.
# ---------------------------------------------------------------------------
register("transform_dimred", P + "misc_programs:ProgTransformDimred")
register("angular_distribution_show",
         P + "misc_programs:ProgAngularDistributionShow")
register("image_odd_even", P + "misc_programs:ProgImageOddEven")
register("transform_adjust_image_grey_levels",
         P + "misc_programs:ProgAdjustGreyLevels")
register("local_volume_adjust", P + "misc_programs:ProgLocalVolumeAdjust")
register("volume_local_sharpening",
         P + "misc_programs:ProgVolumeLocalSharpening")
register("transform_morphology", P + "misc_programs:ProgTransformMorphology")
register("transform_center_image",
         P + "misc_programs:ProgTransformCenterImage")
register("ctf_estimate_from_psd_fast",
         P + "ctf_estimate:ProgCTFEstimateFromPSDFast")

register("nma_modes", P + "nma_programs:ProgNMAModes")
register("nma_alignment_vol", P + "nma_programs:ProgNMAAlignmentVol")
register("pdb_nma_deform", P + "nma_programs:ProgPDBNMADeform")
register("angular_discrete_assign",
         P + "angular_misc:ProgAngularDiscreteAssign")
register("angular_assignment_mag", P + "angular_misc:ProgAngularAssignmentMag")
register("angular_continuous_assign",
         P + "angular_programs:ProgAngularContinuousAssign")
register("angular_break_symmetry", P + "angular_misc:ProgAngularBreakSymmetry")
register("angular_estimate_tilt_axis",
         P + "angular_misc:ProgAngularEstimateTiltAxis")
register("multireference_aligneability",
         P + "angular_misc:ProgMultireferenceAligneability")
register("validation_nontilt", P + "angular_misc:ProgValidationNonTilt")
register("compare_views", P + "angular_misc:ProgCompareViews")

register("tomogram_reconstruction",
         P + "tomo_misc:ProgTomogramReconstruction")
register("tomo_detect_landmarks", P + "tomo_misc:ProgTomoDetectLandmarks")
register("tomo_filter_coordinates", P + "tomo_misc:ProgTomoFilterCoordinates")
register("tomo_map_back", P + "tomo_misc:ProgTomoMapBack")
register("tomo_ctf_wiener2d_correction",
         P + "tomo_misc:ProgTomoCtfWiener2DCorrection")
register("subtomo_subtraction", P + "tomo_misc:ProgSubtomoSubtraction")
register("classify_evaluate_classes",
         P + "classify_analysis:ProgClassifyEvaluateClasses")
register("classify_analyze_cluster",
         P + "classify_analysis:ProgClassifyAnalyzeCluster")
register("classify_extract_features",
         P + "classify_analysis:ProgClassifyExtractFeatures")
register("classify_compare_classes",
         P + "classify_analysis:ProgClassifyCompareClasses")
register("classify_first_split",
         P + "classify_analysis:ProgClassifyFirstSplit")
register("classify_first_split3",
         P + "classify_analysis:ProgClassifyFirstSplit3")
register("volume_halves_restoration",
         P + "classify_analysis:ProgVolumeHalvesRestoration")
register("cuda_volume_halves_restoration",
         P + "classify_analysis:ProgVolumeHalvesRestoration")
register("volume_find_symmetry",
         P + "classify_analysis:ProgVolumeFindSymmetry")
register("run", P + "classify_analysis:ProgMpiRun")
register("denoising_tv", P + "classify_analysis:ProgDenoisingTV")

register("metadata_xml", P + "final_batch:ProgMetadataXML")
register("metadata_split_3D", P + "final_batch:ProgMetadataSplit3D")
register("phantom_movie", P + "final_batch:ProgPhantomMovie")
register("image_peak_high_contrast",
         P + "final_batch:ProgImagePeakHighContrast")
register("coordinates_noisy_zones_filter",
         P + "final_batch:ProgCoordinatesNoisyZonesFilter")
register("volumeset_align", P + "final_batch:ProgVolumesetAlign")
register("pdb_analysis", P + "final_batch:ProgPDBAnalysis")
register("pdb_label_from_volume", P + "final_batch:ProgPDBLabelFromVolume")
register("pdb_reduce_pseudoatoms",
         P + "final_batch:ProgPDBReducePseudoatoms")
register("pdb_sph_deform", P + "final_batch:ProgPDBSphDeform")
register("compare_density", P + "final_batch:ProgCompareDensity")
register("image_assignment_tilt_pair",
         P + "final_batch:ProgImageAssignmentTiltPair")
register("image_align_tilt_pairs",
         P + "align_tilt_pairs:ProgAlignTiltPairs")
register("ctf_correct_wiener3d", P + "final_batch:ProgCTFCorrectWiener3D")
register("transform_adjust_volume_grey_levels",
         P + "final_batch:ProgAdjustVolumeGreyLevels")

register("metadata_convert_emx",
         P + "metadata_misc:ProgMetadataConvertEMX")

# functionality aliases: reference endpoints whose engine already exists
register("forward_zernike_images",
         P + "zernike_programs:ProgForwardZernikeImages")
register("forward_zernike_volume",
         P + "zernike_programs:ProgForwardZernikeVolume")
register("volume_apply_deform_sph",
         P + "zernike_programs:ProgVolumeApplyCoefficientZernike3D")
register("ctf_correct_phase", P + "ctf_correct:ProgCTFPhaseFlip")
register("image_eliminate_byEnergy",
         P + "image_analysis:ProgEliminateByEnergy")
register("project", P + "phantom_programs:ProgPhantomProject")
register("project_tomography", P + "tomo_programs:ProgTomoProject")

register("resolution_directional",
         P + "resolution_dir:ProgResolutionDirectional")
register("ctf_estimate_psd_with_arma",
         P + "resolution_dir:ProgCTFEstimatePSDWithARMA")
register("psd_estimate", P + "resolution_dir:ProgPSDEstimate")
register("classify_CL2D_core_analysis",
         P + "resolution_dir:ProgClassifyCL2DCoreAnalysis")
register("angular_accuracy_pca",
         P + "resolution_dir:ProgAngularAccuracyPCA")

register("resolution_ssnr", P + "ssnr_residuals:ProgResolutionSSNR")
register("continuous_create_residuals",
         P + "ssnr_residuals:ProgContinuousCreateResiduals")
register("angular_commonline",
         P + "angular_commonline_prog:ProgAngularCommonline")
register("tomo_calculate_landmark_residuals",
         P + "tomo_landmark_residuals:ProgTomoCalculateLandmarkResiduals")
register("tomo_detect_misalignment_residuals",
         P + "tomo_landmark_residuals:ProgTomoDetectMisalignmentResiduals")
register("tomo_extract_particlestacks",
         P + "tomo_landmark_residuals:ProgTomoExtractParticlestacks")

register("sync_data", P + "infra_scripts:ProgSyncData")
register("compile", P + "infra_scripts:ProgCompile")
register("test_script_importing_module",
         P + "infra_scripts:ProgTestScriptImportingModule")
register("matlab_bridge", P + "matlab_bridge:ProgMatlabBridge")
register("metadata_selfile_create",
         P + "scripts_misc:ProgMetadataSelfileCreate")
register("pdb_center", P + "scripts_misc:ProgPdbCenter")
register("pdb_select", P + "scripts_misc:ProgPdbSelect")
register("coordinates_consensus",
         P + "scripts_misc:ProgCoordinatesConsensus")
register("pick_noise", P + "scripts_misc:ProgPickNoise")
register("preprocess_mics", P + "scripts_misc:ProgPreprocessMics")
register("volume_consensus", P + "scripts_misc:ProgVolumeConsensus")
register("cl2d_clustering", P + "scripts_misc:ProgCl2dClustering")
register("align_pca_2d", P + "scripts_misc:ProgAlignPCA2D")
register("alignPCA_2D", P + "scripts_misc:ProgAlignPCA2D")
register("graph_max_cut", P + "scripts_misc:ProgGraphMaxCut")
register("extract_particles", P + "scripts_misc:ProgExtractParticles")
register("tomo_misalignment_resid_statistics",
         P + "scripts_misc:ProgTomoMisalignmentResidStatistics")
register("swiftalign_wiener_2d", P + "scripts_misc:ProgSwiftalignWiener2D")
register("swiftalign_aligned_2d_classification",
         P + "scripts_misc:ProgSwiftalignAligned2DClassification")

register("deep_consensus", P + "deep_programs:ProgDeepConsensus")
register("deep_micrograph_cleaner",
         P + "deep_programs:ProgDeepMicrographCleaner")
register("deep_hand", P + "deep_programs:ProgDeepHand")
register("deepRes_resolution", P + "deep_programs:ProgDeepResResolution")
register("deep_res_resolution", P + "deep_programs:ProgDeepResResolution")
register("deep_global_assignment",
         P + "deep_programs:ProgDeepGlobalAssignment")
register("deep_global_assignment_predict",
         P + "deep_programs:ProgDeepGlobalAssignmentPredict")
register("deep_misalignment_detection",
         P + "deep_programs:ProgDeepMisalignmentDetection")
register("deep_volume_postprocessing",
         P + "deep_programs:ProgDeepVolumePostprocessing")

register("nma_alignment", P + "flex_misc_ext:ProgNMAAlignment")
register("flexible_alignment", P + "flex_misc_ext:ProgFlexibleAlignment")
register("forward_zernike_subtomos",
         P + "flex_misc_ext:ProgForwardZernikeSubtomos")
register("forward_zernike_images_priors",
         P + "zernike_programs:ProgForwardZernikeImagesPriors")
register("art_zernike3d", P + "flex_misc_ext:ProgArtZernike3D")
register("forward_art_zernike3d_subtomos",
         P + "flex_misc_ext:ProgForwardArtZernike3DSubtomos")
register("cuda11_forward_art_zernike3d",
         P + "flex_misc_ext:ProgCuda11ForwardArtZernike3D")
register("classify_FTTRI", P + "flex_misc_ext:ProgClassifyFTTRI")
register("classify_CLTomo_prog", P + "flex_misc_ext:ProgClassifyCLTomo")
register("volume_initial_simulated_annealing",
         P + "flex_misc_ext:ProgVolumeInitialSimulatedAnnealing")
register("phantom_transform", P + "flex_misc_ext:ProgPhantomTransform")
register("volume_to_web", P + "flex_misc_ext:ProgVolumeToWeb")
register("resolution_pdb_bfactor",
         P + "flex_misc_ext:ProgResolutionPdbBfactor")
register("performance_test", P + "flex_misc_ext:ProgPerformanceTest")
register("write_test", P + "flex_misc_ext:ProgWriteTest")
register("reconstruct_fourier_accel", P + "reconstruct_fourier")

from xmipp3_tpu.programs import _REGISTRY as _R

# the reference's actual mpi_* endpoint list (SURVEY.md Appendix A, 51 names);
# aliased where the serial twin exists in this framework
_MPI_NAMES = [
    "angular_accuracy_pca", "angular_assignment_mag", "angular_class_average",
    "angular_continuous_assign", "angular_continuous_assign2",
    "angular_discrete_assign", "angular_project_library",
    "angular_projection_matching", "angular_sph_alignment", "classify_CL2D",
    "classify_CL2D_core_analysis", "classify_CLTomo_prog", "classify_FTTRI",
    "continuous_create_residuals", "ctf_correct_phase", "ctf_correct_wiener2d",
    "ctf_sort_psds", "cuda_reconstruct_fourier", "forward_zernike_images",
    "forward_zernike_images_priors", "forward_zernike_subtomos",
    "image_eliminate_byEnergy", "image_operate", "image_resize",
    "image_rotational_pca", "image_sort", "image_ssnr", "ml_align2d",
    "mlf_align2d", "multireference_aligneability", "nma_alignment",
    "nma_alignment_vol", "performance_test", "reconstruct_art",
    "reconstruct_fourier", "reconstruct_fourier_accel",
    "reconstruct_significant", "reconstruct_wbp", "run",
    "subtomo_subtraction", "subtract_projection",
    "transform_adjust_image_grey_levels", "transform_filter",
    "transform_geometry", "transform_mask", "transform_normalize",
    "transform_symmetrize", "transform_threshold", "validation_nontilt",
    "volumeset_align", "write_test",
]
_SERIAL_MAP = {
    "ctf_correct_phase": "ctf_phase_flip",
    "cuda_reconstruct_fourier": "reconstruct_fourier",
    "reconstruct_fourier_accel": "reconstruct_fourier",
}
for _name in _MPI_NAMES:
    _serial = _SERIAL_MAP.get(_name, _name)
    if _serial in _R:
        register("mpi_" + _name, _R[_serial])

# cuda_* endpoints of the reference similarly map to the device-native twins
for _cuda, _serial in {
    "cuda_reconstruct_fourier": "reconstruct_fourier",
    "cuda_align_significant": "align_significant",
    "cuda_movie_alignment_correlation": "movie_alignment_correlation",
    "cuda_angular_continuous_assign2": "angular_continuous_assign2",
}.items():
    if _serial in _R:
        register(_cuda, _R[_serial])
register("volume_deform_sph", P + "zernike_programs:ProgVolumeDeformSph")
register("volume_apply_coefficient_zernike3d",
         P + "zernike_programs:ProgVolumeApplyCoefficientZernike3D")
register("angular_sph_alignment",
         P + "zernike_programs:ProgAngularSphAlignment")
register("cuda_volume_deform_sph", P + "zernike_programs:ProgVolumeDeformSph")
register("cuda_angular_sph_alignment",
         P + "zernike_programs:ProgAngularSphAlignment")
register("mlf_align2d", P + "classify:ProgMLFAlign2D")
register("mpi_mlf_align2d", P + "classify:ProgMLFAlign2D")
register("mpi_angular_sph_alignment",
         P + "zernike_programs:ProgAngularSphAlignment")
