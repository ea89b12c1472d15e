"""Solution visualisation.

Counterparts of the reference's plotting helpers: ``matplotlib_plot3d``
(``helmFE_var.py:609-623``, pcolor heatmap of a flattened N^2 field),
``drawX3D`` (``p_h-PY_C-CL-multi-GPU.py:43-89``, real/imag 3-D surfaces)
and the Gnuplot pipe writer ``plot3d`` (``gnuplot_splot`` -- pipes to a
gnuplot subprocess when one exists, else writes a self-contained ``.gp``
script).  All imports are lazy so headless solver runs never touch
matplotlib.
"""
from __future__ import annotations

import numpy as np


def _square(f):
    f = np.asarray(f)
    if f.ndim == 1:
        n = int(np.sqrt(f.size))
        f = f.reshape(n, n)
    return f


def plot_field(f, label: str = "", show: bool = True, path: str = None):
    """Heatmap of a (flattened) grid field (== ``matplotlib_plot3d``)."""
    import matplotlib
    if path is not None:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    ff = _square(f)
    n = ff.shape[0]
    x = np.linspace(0.0, 1.0, n)
    xx, yy = np.meshgrid(x, x)
    fig = plt.figure()
    plt.pcolormesh(xx, yy, np.abs(ff) if np.iscomplexobj(ff) else ff)
    plt.colorbar()
    plt.title(label)
    if path is not None:
        fig.savefig(path, dpi=120)
        plt.close(fig)
    elif show:
        plt.show()
    return fig


def plot_surface3d(f, label: str = "", parts=("real", "imag"),
                   show: bool = True, path: str = None):
    """Real/imag 3-D surfaces of a complex grid field (== ``drawX3D``)."""
    import matplotlib
    if path is not None:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    ff = _square(f)
    n = ff.shape[0]
    x = np.linspace(0.0, 1.0, n)
    xx, yy = np.meshgrid(x, x)
    fig = plt.figure(figsize=(6 * len(parts), 5))
    for i, part in enumerate(parts):
        ax = fig.add_subplot(1, len(parts), i + 1, projection="3d")
        z = getattr(ff, part) if np.iscomplexobj(ff) else ff
        ax.plot_surface(xx, yy, z, cmap="viridis", linewidth=0)
        ax.set_title(f"{label} ({part})")
    if path is not None:
        fig.savefig(path, dpi=120)
        plt.close(fig)
    elif show:
        plt.show()
    return fig


def gnuplot_splot(f, label: str = "", script_path: str = None,
                  persist: bool = True):
    """Contour-base ``splot`` of a 2-D field through a Gnuplot pipe --
    the analogue of the reference's ``plot3d``
    (``p_h-PY_C-CL-multi-GPU.py:2088-2105``: parametric, style data
    lines, contour base, GridData splot).

    Pipes the script + inline grid data to a ``gnuplot`` subprocess
    when the binary exists.  When it does not (or ``script_path`` is
    given), writes a self-contained ``.gp`` script with the data
    inlined as a heredoc ``$grid`` block -- run it anywhere with
    ``gnuplot -persist <file>``.  Returns the script text.
    """
    import shutil
    import subprocess

    ff = _square(f)
    if np.iscomplexobj(ff):
        ff = (ff.real + ff.imag) / 2.0    # the reference's aver(real,imag)
    rows = "\n".join(" ".join(f"{v:.9g}" for v in row) for row in ff)
    lbl = str(label).replace("'", "''")   # gnuplot single-quote escape
    script = (
        "$grid << EOD\n" + rows + "\nEOD\n"
        "set parametric\n"
        "set style data lines\n"
        "set contour base\n"
        f"set title '{lbl}'\n"
        "set xlabel 'x'\nset ylabel 'y'\n"
        "splot $grid matrix notitle\n")
    if script_path is not None:
        with open(script_path, "w") as fh:
            fh.write(script)
        return script
    exe = shutil.which("gnuplot")
    if exe is None:
        raise RuntimeError(
            "no gnuplot binary on PATH; pass script_path= to write a "
            "self-contained .gp script instead")
    args = [exe] + (["-persist"] if persist else [])
    subprocess.run(args, input=script.encode(), check=True)
    return script
