"""TCP string-protocol interop example.

Mirrors /root/reference/examples/tcpstrings/SimpleExample.jl + the Python
clients (JLSLAMInterf.py): start the SLAM server, drive it with INIT /
ODOMETRY / LANDMBR / BATCHSOLVE / GETPARTICLES / QUIT commands over a socket.

    python examples/tcp_interop.py
"""

import numpy as np

from rome_tpu.interop.tcp_server import SlamTcpClient, SlamTcpServer


def main():
    server = SlamTcpServer(port=60123)
    server.serve_background()

    cli = SlamTcpClient(port=60123)
    print("INIT       ->", cli.send_cmd("INIT"))
    print("ODOMETRY   ->", cli.send_cmd(
        "ODOMETRY 1 2 1.0 0.0 0.1 0.01 0 0 0.01 0 0.001"))
    print("ODOMETRY   ->", cli.send_cmd(
        "ODOMETRY 2 3 1.0 0.0 0.1 0.01 0 0 0.01 0 0.001"))
    print("LANDMBR    ->", cli.send_cmd("LANDMBR 2 7 0.2 4.0 0.05 0.0 0.3"))
    print("BATCHSOLVE ->", cli.send_cmd("BATCHSOLVE"))
    pts = cli.get_particles("x1")
    print(f"GETPARTICLES x1 -> {pts.shape} mean={np.round(pts.mean(axis=0), 3)}")
    print("QUIT       ->", cli.send_cmd("QUIT"))
    cli.close()


if __name__ == "__main__":
    main()
