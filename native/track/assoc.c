/* Greedy assignment scan for the OC-SORT association step.
 *
 * Mirrors clearcam_tpu/track/ocsort.py:greedy_assignment's scan loop (which
 * itself mirrors the reference linear_assignment, association.py:32-52):
 * walk cost cells in the caller-provided ascending order, take a pair when
 * both its row and column are free, stop when either side is exhausted.
 *
 * The caller keeps numpy's argsort (tie-breaking must match the Python
 * fallback bit-for-bit); only the interpreter-bound scan moves to C — at
 * 128 cameras the Python loop was ~45% of the tracker tick.
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* order: flat row-major indices, ascending cost; out: int32 (r,c) pairs.
 * Returns the number of pairs written (<= min(rows, cols)), or -1 on
 * allocation failure. */
int cc_greedy_scan(const int64_t *order, int64_t n_cells, int32_t rows,
                   int32_t cols, int32_t *out) {
  if (rows <= 0 || cols <= 0) return 0;
  unsigned char *used = (unsigned char *)calloc((size_t)rows + cols, 1);
  if (!used) return -1;
  unsigned char *row_used = used, *col_used = used + rows;
  int32_t rows_left = rows, cols_left = cols, n = 0;
  for (int64_t i = 0; i < n_cells; i++) {
    int64_t flat = order[i];
    int32_t r = (int32_t)(flat / cols), c = (int32_t)(flat % cols);
    if (!row_used[r] && !col_used[c]) {
      out[2 * n] = r;
      out[2 * n + 1] = c;
      n++;
      row_used[r] = col_used[c] = 1;
      if (--rows_left == 0 || --cols_left == 0) break;
    }
  }
  free(used);
  return n;
}
