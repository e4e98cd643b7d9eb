// Executes the K4 dashboard page's inline script under minimal stubs of
// the vendored chart libs (Highcharts/noUiSlider stay out of the repo —
// SURVEY §7.5 non-goal) and asserts every chart updater ran and
// rendered data at bind time. Usage:
//   sbt 'Test/runMain graft.DumpPage /tmp/dash.html'
//   node tools/dashboard_harness.js /tmp/dash.html
const fs = require('fs');
const html = fs.readFileSync(process.argv[2] || '/tmp/dash.html', 'utf8');
const js = html.match(/<script>([\s\S]*?)<\/script>/)[1];

const charts = {};
global.Highcharts = {
  setOptions: () => {},
  chart: (container, cfg) => {
    const series = (cfg.series || []).map(s => ({
      data: s.data,
      setData(d) { this.data = d; charts[container].touched = true; }
    }));
    charts[container] = { cfg, series, touched: false,
      update: () => {}, showNoData: () => {}, hideNoData: () => {} };
    return charts[container];
  }
};
global.noUiSlider = {
  create: (el, opts) => {
    el.noUiSlider = {
      get(_) { return [opts.range.min, opts.range.max]; },
      on(ev, fn) { fn(); } // noUiSlider fires "update" when bound
    };
  }
};
const elements = {};
global.document = {
  getElementById: (id) => elements[id] ||= {
    id, innerText: null, value: "Todas",
    addEventListener: () => {}
  }
};
global.setTimeout = (fn) => fn(); // run the debounce synchronously
global.clearTimeout = () => {};

eval(js);

let bad = 0;
for (const [c, ch] of Object.entries(charts)) {
  const n = (ch.series[0].data || []).length;
  console.log(`${c}: series0=${n} touched=${ch.touched}`);
  if (!ch.touched) bad++;
}
const docs = elements['indicator_total_documents'].innerText;
console.log('indicator_total_documents =', docs);
console.log('indicator_total_fulltext =',
  elements['indicator_total_fulltext'].innerText);
const expected = parseInt(process.argv[3] || '11', 10);
if (bad || docs === null || Object.keys(charts).length !== expected) {
  console.log('FAIL'); process.exit(1);
}
console.log('ALL_UPDATERS_RAN');
