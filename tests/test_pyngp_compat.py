"""pyngp API-surface parity (reference src/python_api.cu:266-446):
scripts written against the reference's pybind11 module must find the
same names on the compat shim and the Testbed facade."""

import inspect


def test_pyngp_module_surface():
    import instant_ngp_tpu.pyngp_compat as ngp

    # enums exposed at module level (python_api.cu enum registrations)
    for name in ["TestbedMode", "RenderMode", "LossType", "LensMode",
                 "ColorSpace", "TonemapCurve", "Activation",
                 "GroundTruthRenderMode", "SDFGroundTruthMode",
                 "MeshSdfMode", "NerfMode", "SdfMode", "ImageMode",
                 "VolumeMode", "GeometryMode", "Testbed",
                 "mode_from_scene", "free_temporary_memory"]:
        assert hasattr(ngp, name), f"pyngp surface missing {name}"


def test_testbed_facade_methods():
    from instant_ngp_tpu.testbed import Testbed

    # the pyngp Testbed methods the reference binds (python_api.cu)
    for name in ["load_file", "load_training_data", "frame", "train",
                 "render", "screenshot", "save_snapshot", "load_snapshot",
                 "reload_network_from_file", "reload_network_from_json",
                 "compute_marching_cubes_mesh", "save_mesh",
                 "calculate_iou", "override_sdf_training_data",
                 "train_stats", "profile_trace"]:
        assert callable(getattr(Testbed, name, None)), \
            f"Testbed facade missing {name}"

    # attribute-style state the reference exposes (testbed.h toggles)
    tb = Testbed()
    for attr in ["shall_train", "background_color", "training_batch_size",
                 "shall_render", "dynamic_res_target_fps"]:
        assert hasattr(tb, attr), f"Testbed missing attribute {attr}"


def test_testbed_render_signature_matches_reference():
    """render(width, height, spp, linear) per run.py:240-242 usage."""
    from instant_ngp_tpu.testbed import Testbed

    sig = inspect.signature(Testbed.render)
    params = list(sig.parameters)
    assert params[1:4] == ["width", "height", "spp"]
    assert "linear" in sig.parameters
