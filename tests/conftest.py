import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from doc_ocr_ray.runtime import configure_data_context
    configure_data_context(4)
    yield
    ray.shutdown()
