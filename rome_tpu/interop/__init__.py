"""interop subpackage of rome_tpu: cross-language TCP string protocol."""

from rome_tpu.interop.tcp_server import TCPSLAMClient, TCPSLAMServer

__all__ = ["TCPSLAMServer", "TCPSLAMClient"]
