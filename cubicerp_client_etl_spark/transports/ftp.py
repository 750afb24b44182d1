"""FTP file transport (SURVEY A7/I6).

The reference connects ``ftplib.FTP(host, login, password)`` as the
'fs' server connection when ``fs_protocol == 'ftp'``
(cubicerpetl/cubicerpetl.py:181-187) and moves whole files through it;
filenames carry the same date-template vars as local paths
(cubicerpetl.py:824-826).

Spark executors cannot read ``ftp://`` natively, so the engine stages:
``fetch()`` pulls the remote file to a local spool directory
(driver-side, one stream) and returns the local path the parallel
readers consume; ``put()`` uploads a locally rendered sink file. This
staging is the honest scale posture for a legacy single-stream
protocol — the wire transfer is inherently serial, but everything
after the spool (parse, transform, aggregate, write) is a normal
distributed plan. 100 TB data paths belong on an object store or
distributed FS; FTP exists for operational parity with the
reference's legacy endpoints.
"""

from __future__ import annotations

import ftplib
import os
import tempfile

from cubicerp_client_etl_spark.compilers.template import render_date_template


class FtpTransport:
    """Staged fetch/put against one FTP endpoint.

    Connections are opened per operation (FTP sessions are cheap and
    legacy servers drop idle control channels); ``spool_dir`` defaults
    to a per-transport temp dir.
    """

    def __init__(
        self,
        host: str,
        port: int = 21,
        user: str = "anonymous",
        password: str = "",
        spool_dir: str | None = None,
        timeout: float = 30.0,
        passive: bool = True,
    ) -> None:
        self.host = host
        self.port = port
        self.user = user
        self.password = password
        self.timeout = timeout
        self.passive = passive
        self.spool_dir = spool_dir or tempfile.mkdtemp(prefix="ftp_spool_")

    def _connect(self) -> ftplib.FTP:
        ftp = ftplib.FTP()
        ftp.connect(self.host, self.port, timeout=self.timeout)
        ftp.login(self.user, self.password)
        ftp.set_pasv(self.passive)
        return ftp

    def fetch(
        self,
        remote_name: str,
        run_date: str | None = None,
        dest: str | None = None,
    ) -> str:
        """Download ``remote_name`` (date-templated when ``run_date`` is
        given) into the spool; returns the local path."""
        name = (
            render_date_template(remote_name, run_date) if run_date else remote_name
        )
        local = dest or os.path.join(self.spool_dir, os.path.basename(name))
        os.makedirs(os.path.dirname(local) or ".", exist_ok=True)
        with self._connect() as ftp, open(local, "wb") as f:
            ftp.retrbinary(f"RETR {name}", f.write)
        return local

    def put(
        self,
        local_path: str,
        remote_name: str,
        run_date: str | None = None,
    ) -> str:
        """Upload ``local_path`` as ``remote_name`` (date-templated when
        ``run_date`` is given); returns the rendered remote name."""
        name = (
            render_date_template(remote_name, run_date) if run_date else remote_name
        )
        with self._connect() as ftp, open(local_path, "rb") as f:
            ftp.storbinary(f"STOR {name}", f)
        return name

    def listdir(self, path: str = "") -> list[str]:
        with self._connect() as ftp:
            return sorted(os.path.basename(n) for n in ftp.nlst(path or "."))
