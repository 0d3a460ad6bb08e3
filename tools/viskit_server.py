"""Experiment dashboard (viskit equivalent, reference viskit/frontend.py's
Flask app — rebuilt on the stdlib http.server since this stack carries no
Flask dependency).

Feature parity with the reference frontend (viskit/frontend.py:51-156,
606-757):
  - runs grouped by the hyperparameters whose values differ, or by an
    explicitly chosen group-by parameter;
  - split-by parameter: one plot per distinct value (reference's
    "split" selector);
  - per-parameter value filters (reference's checkbox filter lists);
  - aggregation bands: mean ± std, median with 25/75 percentile band, or
    min/max envelope around the mean (reference plot_div's
    use_median/percentile mode);
  - y/x metric selectors over every column present in any progress.csv.

    python tools/viskit_server.py data/ --port 5000 --y EnvTrajs-AverageReturn
"""
import argparse
import html
import io
import os
import sys
from collections import defaultdict
from urllib.parse import parse_qs, urlparse
from http.server import BaseHTTPRequestHandler, HTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from tools.plot_results import (  # noqa: E402
    find_experiments, varying_params)

BANDS = ('mean-std', 'median-quartiles', 'mean-minmax')


def _param_str(params, key):
    return str(params.get(key, '—'))


def _collect_curves(runs, y_key, x_key):
    curves = []
    for prog in runs:
        if y_key in prog and x_key in prog:
            curves.append((prog[x_key], prog[y_key]))
    return curves


def render_svg(exps, y_key, x_key, group_by, band, title):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    import numpy as np

    groups = defaultdict(list)
    varying = None if group_by else varying_params(exps)
    for dirpath, prog, params in exps:
        if group_by:
            label = f'{group_by}={_param_str(params, group_by)}'
        else:
            label = ', '.join(f'{k}={_param_str(params, k)}'
                              for k in varying) or 'run'
        groups[label].append(prog)

    fig, ax = plt.subplots(figsize=(9, 5.5))
    for label, runs in sorted(groups.items()):
        curves = _collect_curves(runs, y_key, x_key)
        if not curves:
            continue
        n = min(len(c[1]) for c in curves)
        if n == 0:
            continue
        xs = np.asarray(curves[0][0][:n], float)
        ys = np.stack([np.asarray(c[1][:n], float) for c in curves])
        if band == 'median-quartiles':
            center = np.nanmedian(ys, axis=0)
            lo = np.nanpercentile(ys, 25, axis=0)
            hi = np.nanpercentile(ys, 75, axis=0)
        elif band == 'mean-std':
            center = np.nanmean(ys, axis=0)
            sd = np.nanstd(ys, axis=0)
            lo, hi = center - sd, center + sd
        else:  # mean-minmax
            center = np.nanmean(ys, axis=0)
            lo = np.nanmin(ys, axis=0)
            hi = np.nanmax(ys, axis=0)
        (line,) = ax.plot(xs, center, label=f'{label} (n={len(curves)})')
        if len(curves) > 1:
            ax.fill_between(xs, lo, hi, alpha=0.2,
                            color=line.get_color())
    ax.set_xlabel(x_key)
    ax.set_ylabel(y_key)
    if title:
        ax.set_title(title)
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    buf = io.StringIO()
    fig.savefig(buf, format='svg')
    plt.close(fig)
    return buf.getvalue()


def available_keys(exps):
    keys = set()
    for _, prog, _ in exps:
        keys.update(prog.keys())
    return sorted(keys)


def param_values(exps):
    """param -> sorted distinct values, for filter checkboxes and the
    split/group dropdowns (reference frontend's distinct-param lists)."""
    vals = defaultdict(set)
    for _, _, params in exps:
        for k in params:
            vals[k].add(_param_str(params, k))
    return {k: sorted(v) for k, v in sorted(vals.items()) if len(v) > 1}


def _select(name, options, selected, allow_none=True):
    opts = []
    if allow_none:
        opts.append(f'<option value=""{" selected" if not selected else ""}>'
                    '(none)</option>')
    for o in options:
        sel = ' selected' if o == selected else ''
        opts.append(f'<option value="{html.escape(o)}"{sel}>'
                    f'{html.escape(o)}</option>')
    return (f'<select name="{html.escape(name)}">'
            + ''.join(opts) + '</select>')


def build_page(root, q):
    exps = find_experiments(root)
    keys = available_keys(exps)
    pvals = param_values(exps)

    y = q.get('y', ['EnvTrajs-AverageReturn'])[0]
    if y not in keys and keys:
        y = keys[0] if 'EnvTrajs-AverageReturn' not in keys \
            else 'EnvTrajs-AverageReturn'
    x = q.get('x', ['Itr'])[0]
    split_by = q.get('split', [''])[0] or None
    group_by = q.get('group', [''])[0] or None
    band = q.get('band', [BANDS[0]])[0]
    if band not in BANDS:
        band = BANDS[0]

    # per-param value filters: f_<param>=<value> (multi-valued)
    filtered = exps
    active_filters = {}
    for p in pvals:
        # browsers decode the entity-escaped name= attribute back to the raw
        # param before submitting; non-browser clients may echo the escaped
        # form literally — accept either key
        chosen = q.get(f'f_{p}') or q.get(f'f_{html.escape(p)}')
        if chosen:
            active_filters[p] = set(chosen)
            filtered = [e for e in filtered
                        if _param_str(e[2], p) in active_filters[p]]

    # split: one plot per distinct value of the split param
    plots = []
    if split_by and split_by in pvals:
        by_val = defaultdict(list)
        for e in filtered:
            by_val[_param_str(e[2], split_by)].append(e)
        for val, sub in sorted(by_val.items()):
            plots.append(render_svg(sub, y, x, group_by, band,
                                    f'{split_by} = {val}'))
    else:
        plots.append(render_svg(filtered, y, x, group_by, band, None))

    checkboxes = []
    for p, vals in pvals.items():
        boxes = []
        for v in vals:
            checked = (' checked'
                       if p in active_filters and v in active_filters[p]
                       else '')
            boxes.append(
                f'<label><input type="checkbox" name="f_{html.escape(p)}" '
                f'value="{html.escape(v)}"{checked}/>{html.escape(v)}'
                '</label>')
        checkboxes.append(f'<div><b>{html.escape(p)}</b>: '
                          + ' '.join(boxes) + '</div>')

    key_opts = ''.join(
        f'<option value="{html.escape(k)}"'
        f'{" selected" if k == y else ""}>{html.escape(k)}</option>'
        for k in keys)
    band_sel = _select('band', list(BANDS), band, allow_none=False)
    split_sel = _select('split', list(pvals), split_by or '')
    group_sel = _select('group', list(pvals), group_by or '')

    return f"""<!doctype html><html><head>
<title>learning_to_adapt_tpu results</title>
<style>body{{font-family:sans-serif;margin:1em}}
form div{{margin:2px 0}}</style></head><body>
<h2>{html.escape(root)} — {len(filtered)}/{len(exps)} runs</h2>
<form method="get">
<div>y: <select name="y">{key_opts}</select>
 x: <input name="x" value="{html.escape(x)}" size="10"/>
 band: {band_sel}
 split by: {split_sel}
 group by: {group_sel}
 <input type="submit" value="plot"/></div>
{''.join(checkboxes)}
</form>
{''.join(plots)}
</body></html>"""


def make_handler(root):
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            try:
                page = build_page(root, q)
            except Exception as e:  # pragma: no cover
                self.send_response(500)
                self.end_headers()
                self.wfile.write(str(e).encode())
                return
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
    args = p.parse_args()
    server = HTTPServer(('0.0.0.0', args.port), make_handler(args.root))
    print(f'serving {args.root} on http://localhost:{args.port}')
    server.serve_forever()


if __name__ == '__main__':
    main()
