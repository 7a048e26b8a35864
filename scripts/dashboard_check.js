// Render-logic check for the status dashboard (observability/StatusServer
// .scala IndexHtml) without a browser: extracts the inline <script>,
// shims document/fetch/setInterval, feeds canned /status + /jobs JSON,
// and asserts the composed DOM — the reference jobs-page behaviors
// (active/retired split, 'Many' partition collapse, duration only on
// active rows, lag-in-minutes header, ISO dates, active-before-retired
// ordering). Run: node scripts/dashboard_check.js
const fs = require('fs');
const src = fs.readFileSync(
  'src/main/scala/graft/observability/StatusServer.scala', 'utf8');
const block = /val IndexHtml: String =\s*"""([\s\S]*?)""".stripMargin/
  .exec(src)[1];
// apply the same substitution the Scala code does: the retired-status
// set is generated from the RetiredStatuses constant
const retired = /RetiredStatuses: Set\[String\] = Set\(([\s\S]*?)\)/
  .exec(src)[1].split(',').map(s => {
    const m = /JobStatus\.(\w+)/.exec(s.trim());
    return m[1];
  });
const statusValues = {Successful: 'SUCCESSFUL', Failed: 'FAILED',
  NotCompletable: 'NOT_COMPLETABLE', Aborted: 'ABORTED',
  DestNewer: 'DEST_IS_NEWER'};
const retiredJs = retired.map(n => "'" + statusValues[n] + "'")
  .sort().join(',');
const html = block.split('\n').map(l => l.replace(/^\s*\|/, '')).join('\n')
  .replace('@RETIRED@', retiredJs);
const js = /<script>([\s\S]*?)<\/script>/.exec(html)[1]
  .replace(/refresh\(\); setInterval[\s\S]*$/, '');

const status = {jobs: {SUCCESSFUL: 2, PENDING: 1, RUNNING: 1},
  watermark: 42, lagSeconds: 120, lagBucket: 0};
const jobsJson = [
  {id: 4, createTime: 1700000300000, operation: 'COPY_PARTITION',
   status: 'RUNNING', table: 'db.t4', partitions: 'ds=1,ds=2,ds=3',
   extras: 'k=v'},
  {id: 3, createTime: 1700000200000, operation: 'COPY_TABLE',
   status: 'PENDING', table: 'db.t3', renameToDb: 'db2',
   renameToTable: 't3r'},
  {id: 2, createTime: 1700000100000, operation: 'COPY_TABLE',
   status: 'SUCCESSFUL', table: 'db.t2', partitions: 'ds=9'},
  {id: 1, createTime: 1700000000000, operation: 'DROP_TABLE',
   status: 'FAILED', table: 'db.t1'},
];

const els = {};
for (const id of ['rollup', 'counts', 'jobs', 'meta'])
  els[id] = {innerHTML: '', textContent: ''};
global.document = {getElementById: id => els[id]};
global.fetch = async path => ({json: async () =>
  path.startsWith('jobs') ? jobsJson : status});
global.setInterval = () => {};
eval(js);
refresh().then(() => {
  const jobs = els.jobs.innerHTML;
  const checks = [
    ['counts says 2 active', els.counts.textContent === 'Jobs: 2 Active'],
    ['meta lag minutes', els.meta.textContent.includes('lag=120s (2 min)')],
    ['active section present', jobs.includes('Active Jobs')],
    ['retired section present', jobs.includes('Retired Jobs')],
    ['Many collapse for 3 partitions', jobs.includes('<td>Many</td>')],
    ['single partition shown verbatim', jobs.includes('<td>ds=9</td>')],
    ['rename rendered db2.t3r', jobs.includes('<td>db2.t3r</td>')],
    ['extras rendered', jobs.includes('<td>k=v</td>')],
    ['running job has duration', /RUNNING<\/td>[\s\S]*?\d+s<\/td>/.test(jobs)],
    ['retired job has empty duration',
      /SUCCESSFUL[\s\S]*?<td><\/td>/.test(jobs)],
    ['iso dates', jobs.includes('2023-11-14T22:18:20.000Z')],
    ['active ordering before retired',
      jobs.indexOf('db.t4') < jobs.indexOf('db.t2')],
  ];
  let fail = 0;
  for (const [name, ok] of checks) {
    console.log((ok ? 'PASS' : 'FAIL') + ' ' + name);
    if (!ok) fail++;
  }
  if (fail) { console.log(jobs); process.exit(1); }
  console.log('== dashboard render logic: ' + checks.length + ' checks pass ==');
});
