"""Minimal experiment dashboard (viskit equivalent, reference
viskit/frontend.py's Flask app — rebuilt on the stdlib http.server since
this stack carries no Flask dependency).

Serves an HTML index of experiment groups under a data root with SVG plots
(grouped by differing hyperparameters, mean curve + min/max band, same
grouping rule as tools/plot_results.py) and live-reloads on refresh.

    python tools/viskit_server.py data/ --port 5000 --y EnvTrajs-AverageReturn
"""
import argparse
import html
import io
import os
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from tools.plot_results import (  # noqa: E402
    find_experiments, group_key, varying_params)


def render_svg(root, y_key, x_key):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    import numpy as np
    from collections import defaultdict

    exps = find_experiments(root)
    varying = varying_params(exps)
    groups = defaultdict(list)
    for dirpath, prog, params in exps:
        groups[group_key(params, varying)].append((dirpath, prog))

    fig, ax = plt.subplots(figsize=(9, 5.5))
    for key, runs in sorted(groups.items()):
        curves = []
        for _, prog in runs:
            if y_key in prog and x_key in prog:
                curves.append((np.asarray(prog[x_key]),
                               np.asarray(prog[y_key])))
        if not curves:
            continue
        n = min(len(c[1]) for c in curves)
        if n == 0:
            continue
        xs = curves[0][0][:n]
        ys = np.stack([c[1][:n] for c in curves])
        label = ', '.join(f'{k}={v}' for k, v in zip(varying, key)) or 'run'
        ax.plot(xs, np.nanmean(ys, axis=0), label=label)
        if len(curves) > 1:
            ax.fill_between(xs, np.nanmin(ys, axis=0),
                            np.nanmax(ys, axis=0), alpha=0.2)
    ax.set_xlabel(x_key)
    ax.set_ylabel(y_key)
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    buf = io.StringIO()
    fig.savefig(buf, format='svg')
    plt.close(fig)
    return buf.getvalue(), exps


def available_keys(exps):
    keys = set()
    for _, prog, _ in exps:
        keys.update(prog.keys())
    return sorted(keys)


def make_handler(root, default_y, default_x):
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            y = q.get('y', [default_y])[0]
            x = q.get('x', [default_x])[0]
            try:
                svg, exps = render_svg(root, y, x)
            except Exception as e:  # pragma: no cover
                self.send_response(500)
                self.end_headers()
                self.wfile.write(str(e).encode())
                return
            keys = available_keys(exps)
            options = '\n'.join(
                f'<option value="{html.escape(k)}"'
                f'{" selected" if k == y else ""}>{html.escape(k)}</option>'
                for k in keys)
            page = f"""<!doctype html><html><head>
<title>learning_to_adapt_tpu results</title></head><body>
<h2>{html.escape(root)} — {len(exps)} runs</h2>
<form method="get">y: <select name="y">{options}</select>
<input type="hidden" name="x" value="{html.escape(x)}"/>
<input type="submit" value="plot"/></form>
{svg}
</body></html>"""
            self.send_response(200)
            self.send_header('Content-Type', 'text/html')
            self.end_headers()
            self.wfile.write(page.encode())

        def log_message(self, *args):
            pass

    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument('root', type=str)
    p.add_argument('--port', type=int, default=5000)
    p.add_argument('--y', type=str, default='EnvTrajs-AverageReturn')
    p.add_argument('--x', type=str, default='Itr')
    args = p.parse_args()
    server = HTTPServer(('0.0.0.0', args.port),
                        make_handler(args.root, args.y, args.x))
    print(f'serving {args.root} on http://localhost:{args.port}')
    server.serve_forever()


if __name__ == '__main__':
    main()
