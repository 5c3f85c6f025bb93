"""TCP interop tests replaying the reference client script
(examples/tcpstrings/SimpleExample.jl:18-36).
"""

import numpy as np
import pytest

from rome_tpu.interop import TCPSLAMClient, TCPSLAMServer


@pytest.fixture
def server():
    srv = TCPSLAMServer(port=0)  # ephemeral port
    srv.serve_background()
    yield srv
    srv.shutdown()


@pytest.mark.slow
def test_simple_example_session(server):
    """The exact command sequence of SimpleExample.jl."""
    port = server.server_address[1]
    cl = TCPSLAMClient(port=port)
    assert cl.send_cmd("INIT").startswith("OK")
    assert cl.send_cmd(
        "ODOMETRY 1 2 10.0 0.0 0.0 0.1 0 0 0.05 0 0.05"
    ).startswith("OK")
    assert cl.send_cmd(
        "ODOMETRY 2 3 10.0 0.0 0.0 0.1 0 0 0.05 0 0.05"
    ).startswith("OK")
    Vb = cl.get_particles("x3")
    assert Vb.shape[1] == 3
    assert cl.send_cmd("BATCHSOLVE").startswith("OK")
    Va = cl.get_particles("x3")
    np.testing.assert_allclose(Va.mean(axis=0), [20, 0, 0], atol=1.0)

    assert cl.send_cmd(f"LANDMBR 3 4 {np.pi/2} 10.0 0.01 0 0.5").startswith("OK")
    assert cl.send_cmd("BATCHSOLVE").startswith("OK")
    l1 = cl.get_particles("l1")
    assert l1.shape[1] == 2
    np.testing.assert_allclose(l1.mean(axis=0), [20, 10], atol=1.5)
    cl.close()


def test_error_replies(server):
    port = server.server_address[1]
    cl = TCPSLAMClient(port=port)
    assert cl.send_cmd("BOGUS").startswith("ERR unknown command")
    assert cl.send_cmd("GETPARTICLES nope").startswith("ERR unknown label")
    assert cl.send_cmd("ODOMETRY 1").startswith("ERR")  # malformed
    # session still alive after errors
    assert cl.send_cmd("INIT").startswith("OK")
    cl.close()
