from .register import Register, RegisterManager

__all__ = ["Register", "RegisterManager"]
