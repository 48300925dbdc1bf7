#!/usr/bin/env node
'use strict';
// Drive the ACTUAL reference implementation's transform step
// (/root/reference/geonames.js, module.exports.steps[1]) over a staged
// fixture dir, writing each envelope as one JSON line. Run with
//   NODE_PATH=tools/refparity/shims node tools/refparity/run_reference.js \
//     <fixtureDir> <outFile> [nofilters]
// The shims provide only the generic library plumbing (highland/ramda
// subsets; request/yauzl load-time stubs) — every domain decision
// (column map, template filters, extra-URI whitelist, longest-prefix
// classification, relation derivation, envelope construction) executes
// from the reference file itself, unmodified. The writer is external to
// the reference (supplied by the host framework in the original), so its
// JSON.stringify-per-envelope form is the contract boundary, not a shim
// of reference code.
const fs = require('fs');
const path = require('path');

const ref = require('/root/reference/geonames.js');
const transform = ref.steps[1];

const fixtureDir = process.argv[2];
const outFile = process.argv[3];
const mode = process.argv[4] || 'default';

const config = {
  types: { PPL: 'hg:Place', ADM2: 'hg:Municipality', S: 'hg:Spot' },
  filters: mode === 'nofilters' ? [] : [{ countryCode: 'US' }],
  relations: { liesIn: 'hg:liesIn' },
  extraUris: path.join(fixtureDir, 'extra-uris.json'),
};

const lines = [];
const writer = {
  writeObjects(data, cb) {
    for (const el of data) lines.push(JSON.stringify(el));
    cb(null);
  },
};

transform(config, { previous: fixtureDir }, { writer }, (err) => {
  fs.writeFileSync(outFile, lines.length ? lines.join('\n') + '\n' : '');
  if (err) {
    console.log(JSON.stringify({
      status: 'error',
      name: err && err.constructor ? err.constructor.name : typeof err,
      message: String(err && err.message),
      stack: String(err && err.stack).split('\n').slice(0, 3),
      lines_before_error: lines.length,
    }));
    process.exit(3);
  }
  console.log(JSON.stringify({ status: 'ok', lines: lines.length }));
});
