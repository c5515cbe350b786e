from sfd2_tpu.serving.server import LocalizationService, make_server

__all__ = ["LocalizationService", "make_server"]
