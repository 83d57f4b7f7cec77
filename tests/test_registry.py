import pytest

from image_segmentation_lab_tpu.registry import Register, RegisterManager


def test_register_and_get():
    reg = Register("toy")

    @reg.register()
    class Foo:
        pass

    @reg.register("Bar", aliases=("B",))
    class Baz:
        pass

    assert reg.get("Foo") is Foo
    assert reg.get("Bar") is Baz
    assert reg.get("B") is Baz
    assert "Foo" in reg and len(reg) == 3


def test_duplicate_registration_raises():
    reg = Register("toy2")

    @reg.register()
    class Foo:
        pass

    with pytest.raises(KeyError):
        @reg.register("Foo")
        class Foo2:
            pass


def test_get_missing_raises():
    reg = Register("toy3")
    with pytest.raises(KeyError, match="not registered"):
        reg.get("Nope")


def test_manager_caches():
    a = RegisterManager.create_registry("same_name_xyz")
    b = RegisterManager.create_registry("same_name_xyz")
    assert a is b
